#!/usr/bin/env python3
"""Round-5: sched16 minus rebuckets.  Runs the EXACT production
margin-scheduled window (make_scan_steps(16, fresh=True)) with
sim._rebucket stubbed to identity — the pic_step margin variants hit the
compilation cache from the real sched16, so this compiles fast and the
difference to sched16 is the total rebucket bill (4 electron rebuckets
incl. their XLA glue) per 16 steps.
Run: python experiments/r5_schednr.py [grid_n]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128

deck = f"""
[time]
nTimeSteps = 40
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = {N},{N},{N}
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 32 pc
nAlloc = 32 pc
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
"""
cfg = PincConfig.from_string(deck)
sim = TiledSimulation(cfg, seed=1)
ts = sim.ts
print(f"NT={ts.NT} B={ts.B} M={ts.M} cad={sim.rebucket_every_s}",
      file=sys.stderr, flush=True)
st = sim.state
sim.state = None
n = 4 * min(sim.rebucket_every_s)

# stub the rebucket: state passes through, zero drops
sim._rebucket = lambda stt, species=None: (stt, jnp.zeros((), jnp.int32))

t0 = time.monotonic()
run_n = sim.make_scan_steps(n, donate=True, fresh=True)
st2, _ = run_n(st)
jax.block_until_ready(st2.lpos)
print(f"schednr16: compile+first {time.monotonic()-t0:.1f}s",
      file=sys.stderr, flush=True)
t0 = time.monotonic()
for _ in range(2):
    st2, _ = run_n(st2)
jax.block_until_ready(st2.lpos)
dt = (time.monotonic() - t0) / 2 / n
print(f"schednr16: {dt*1e3:8.2f} ms/step", flush=True)
print("done", flush=True)
