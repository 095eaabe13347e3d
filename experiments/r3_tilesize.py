#!/usr/bin/env python3
"""Round-3: tile-size sweep for the Debye-resolved (and headline) decks.

Hypothesis: at margin M the padded node count is P = T+1+2M; the pic_step
MXU passes scale with ceil(P^2/128) and the VPU kron builds with P^2, while
total slots NT*B are T-invariant (at fixed slack).  So T=4/M=2 (P=9,
P^2=81) should run the Debye deck at ~the margin-1 headline's kernel cost,
and T=4/M=1 (P=6, P^2=36) may beat the headline itself.

Run: python experiments/r3_tilesize.py [vth] [T,M[,slack[,cap[,rows]]]] ...
e.g. python experiments/r3_tilesize.py 0.1 8,2 4,2 4,2,1.25
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

VTH = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
CONFIGS = []
for a in sys.argv[2:]:
    parts = a.split(",")
    T, M = int(parts[0]), int(parts[1])
    slack = float(parts[2]) if len(parts) > 2 else 1.0625
    cap = int(parts[3]) if len(parts) > 3 else 0
    rows = parts[4] if len(parts) > 4 else ""
    CONFIGS.append((T, M, slack, cap, rows))
if not CONFIGS:
    CONFIGS = [(8, 2, 1.0625, 0, ""), (4, 2, 1.0625, 0, ""),
               (4, 2, 1.25, 0, ""), (4, 1, 1.0625, 0, "")]

STEPS = 40

DECK = """
[time]
nTimeSteps = {steps}
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = 128,128,128
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 32 pc
nAlloc = 32 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = {vth},{vthi}
drift = 0
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
[tiles]
tileSize = {T}
margin = {M}
mxuDtype = bf16
slack = {slack}
{extra}
"""

for T, M, slack, cap, rows in CONFIGS:
    extra = ""
    if cap:
        extra += f"exchangeCap = {cap}\n"
    if rows:
        extra += f"exchangeRows = {rows}\n"
    deck = DECK.format(steps=STEPS, vth=VTH, vthi=VTH * 0.023, T=T, M=M,
                       slack=slack, extra=extra)
    cfg = PincConfig.from_string(deck)
    try:
        t0 = time.monotonic()
        sim = TiledSimulation(cfg, seed=1)
        carry = sim.state
        n_particles = int(jax.device_get(sim.state.alive.sum()))
        sim.state = None
        setup = time.monotonic() - t0
        run_n = sim.make_scan_steps(STEPS, donate=True)
        t0 = time.monotonic()
        carry, _ = run_n(carry)
        jax.block_until_ready(carry.lpos)
        compile_t = time.monotonic() - t0
        t0 = time.monotonic()
        carry, (ke, pe, dropped) = run_n(carry)
        jax.block_until_ready(carry.lpos)
        wall = time.monotonic() - t0
        psteps = n_particles * STEPS / wall
        print(f"T={T} M={M} slack={slack} cap={cap or 'auto'} "
              f"rows={rows or 'auto'}: B={sim.ts.B} NT={sim.ts.NT} "
              f"P={sim.ts.P} cad={sim.rebucket_every_s} "
              f"K={sim._exchange_cap} rows_on={sim._exchange_rows} | "
              f"{wall / STEPS * 1e3:7.1f} ms/step -> {psteps:.3e} p-s/s "
              f"dropped={int(dropped)} KE={float(np.asarray(ke)[-1].sum()):.4g} "
              f"(setup {setup:.0f}s compile {compile_t:.0f}s)",
              flush=True)
        del carry, sim, run_n
    except Exception as e:
        print(f"T={T} M={M} slack={slack}: FAILED {type(e).__name__}: {e}",
              flush=True)
