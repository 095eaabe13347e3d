#!/usr/bin/env python3
"""Round-4: diagnose gather-exchange drops on the headline-like deck.

Runs the production scan window at a configurable scale with the
gather exchange and reports drops per window, then re-runs the SAME
initial state through the one-hot per-tile exchange for comparison.
Usage: python experiments/r4_dropdiag.py [grid_n] [steps] [ppc]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 176
PPC = int(sys.argv[3]) if len(sys.argv) > 3 else 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(impl):
    cfg = PincConfig.from_string(f"""
[time]
nTimeSteps = {STEPS}
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = {N},{N},{N}
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = {PPC} pc
nAlloc = {PPC} pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.1,0.0023
drift = 0
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
[tiles]
tileSize = 8
mxuDtype = bf16
slack = 1.0625
exchangeImpl = {impl}
""")
    sim = TiledSimulation(cfg, seed=1)
    log(f"[{impl}] rows={sim._exchange_rows} cap={sim._exchange_cap} "
        f"B={sim.ts.B} cad={sim.rebucket_every_s}")
    st = sim.state
    sim.state = None
    run_n = sim.make_scan_steps(STEPS, donate=True)
    t0 = time.monotonic()
    st, (ke, pe, dropped) = run_n(st)
    jax.block_until_ready(st.lpos)
    log(f"[{impl}] window 1: {time.monotonic()-t0:.1f}s "
        f"dropped={int(dropped)}")
    t0 = time.monotonic()
    st, (ke, pe, dropped) = run_n(st)
    jax.block_until_ready(st.lpos)
    log(f"[{impl}] window 2: {time.monotonic()-t0:.1f}s "
        f"dropped={int(dropped)} KE[-1]={float(ke[-1].sum()):.4g}")
    return int(dropped)


for impl in sys.argv[4:] or ("gather", "onehot"):
    run(impl)
