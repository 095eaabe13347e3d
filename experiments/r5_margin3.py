#!/usr/bin/env python3
"""Round-5: headline deck at tiles:margin=3 (electron cadence 6).  Same
window discipline as bench.py (window = slow cadence, fresh=True margin
schedule).  Run: python experiments/r5_margin3.py [margin]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()
M = int(sys.argv[1]) if len(sys.argv) > 1 else 3

deck = f"""
[time]
nTimeSteps = 40
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
margin = {M}
"""
cfg = PincConfig.from_string(deck)
t0 = time.monotonic()
sim = TiledSimulation(cfg, seed=1)
carry = sim.state
n_particles = int(jax.device_get(sim.state.alive.sum()))
sim.state = None
Rs = sim.rebucket_every_s
Ri, Re = max(Rs), min(Rs)
steps = Ri if Ri % Re == 0 and Ri <= 400 else 4 * Re
print(f"setup {time.monotonic()-t0:.1f}s cad={Rs} window={steps} "
      f"P={sim.ts.P} B={sim.ts.B}", file=sys.stderr, flush=True)
run_n = sim.make_scan_steps(steps, donate=True, fresh=True)
t0 = time.monotonic()
carry, (_, _, d0) = run_n(carry)
jax.block_until_ready(carry.lpos)
print(f"compile+first {time.monotonic()-t0:.1f}s dropped={int(d0)}",
      file=sys.stderr, flush=True)
t0 = time.monotonic()
carry, (ke, pe, dropped) = run_n(carry)
jax.block_until_ready(carry.lpos)
wall = time.monotonic() - t0
print(f"RESULT-M{M} {n_particles * steps / wall:.4g} p-steps/s "
      f"({wall/steps*1e3:.1f} ms/step, dropped={int(dropped)})",
      flush=True)
