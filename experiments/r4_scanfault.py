#!/usr/bin/env python3
"""Round-4: bisect the TPU device fault seen when the gather exchange
runs inside the production mega scan (bench headline, rows=True+gather).

Runs the production TiledSimulation scan window at a configurable scale
and exchange impl.  Usage:
    python experiments/r4_scanfault.py <grid_n> <steps> <impl> [ppc]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
IMPL = sys.argv[3] if len(sys.argv) > 3 else "auto"
PPC = int(sys.argv[4]) if len(sys.argv) > 4 else 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
exchangeImpl = {IMPL}
""")
sim = TiledSimulation(cfg, seed=1)
log(f"NT={sim.ts.NT} B={sim.ts.B} M={sim.ts.M} rows={sim._exchange_rows} "
    f"impl={IMPL} cadences={sim.rebucket_every_s}")
carry = sim.state
sim.state = None
run_n = sim.make_scan_steps(STEPS, donate=True)
t0 = time.monotonic()
carry, (ke, pe, dropped) = run_n(carry)
jax.block_until_ready(carry.lpos)
log(f"compile+first window: {time.monotonic()-t0:.1f}s "
    f"dropped={int(dropped)}")
t0 = time.monotonic()
carry, (ke, pe, dropped) = run_n(carry)
jax.block_until_ready(carry.lpos)
log(f"window 2: {time.monotonic()-t0:.2f}s KE[-1]={float(ke[-1].sum()):.4g} "
    f"dropped={int(dropped)}")
print("OK")
