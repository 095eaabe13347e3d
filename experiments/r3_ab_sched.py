"""A/B timing of margin schedule x fused exchange x window length at the
bench operating point (128^3, 32 ppc, Debye-resolved vth)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

N = int(os.environ.get("N", "128"))
PPC = int(os.environ.get("PPC", "32"))
DECK = f"""
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
"""

CONFIGS = [
    ("r2-like", False, False, 40),
    ("fused40", False, True, 40),
    ("sched+fused176", True, True, 176),
    ("plain176", False, False, 176),
    ("sched176", True, False, 176),
]
only = os.environ.get("ONLY")

for name, sched, fused, steps in CONFIGS:
    if only and name != only:
        continue
    cfg = PincConfig.from_string(DECK)
    cfg.set_str("tiles:marginschedule", "true" if sched else "false")
    cfg.set_str("tiles:exchangefused", "true" if fused else "false")
    sim = TiledSimulation(cfg, seed=1)
    carry = sim.state
    n_particles = int(jax.device_get(carry.alive.astype("int32").sum()))
    sim.state = None
    run_n = sim.make_scan_steps(steps, donate=True, fresh=True)
    t0 = time.monotonic()
    carry, (_, _, d0) = run_n(carry)
    jax.block_until_ready(carry.lpos)
    tc = time.monotonic() - t0
    t0 = time.monotonic()
    carry, (_, _, d1) = run_n(carry)
    jax.block_until_ready(carry.lpos)
    wall = time.monotonic() - t0
    print(f"{name}: steps={steps} compile+w1={tc:.0f}s "
          f"w2={wall:.2f}s -> {n_particles * steps / wall:.3e} psteps/s "
          f"(d0={int(d0)} d1={int(d1)})", flush=True)
    del carry, run_n, sim
