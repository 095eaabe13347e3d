"""Reproduce bench's dropped=-83: TiledSimulation window on TPU,
bisect margin-schedule x fused-exchange."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation

N = int(os.environ.get("N", "64"))
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

for sched in (True, False):
    for fused in (True, False):
        over = [f"tiles:marginschedule={'true' if sched else 'false'}",
                f"tiles:exchangefused={'true' if fused else 'false'}"]
        cfg = PincConfig.from_string(DECK)
        for o in over:
            k, v = o.split("=")
            cfg.set_str(k, v)
        sim = TiledSimulation(cfg, seed=1)
        st = sim.state
        n0 = int(jax.device_get(st.alive.astype("int32").sum()))
        Rs = sim.rebucket_every_s
        Ri, Re = max(Rs), min(Rs)
        steps = Ri if Ri % Re == 0 and Ri <= 400 else 4 * Re
        run_n = sim.make_scan_steps(steps, fresh=True)
        t0 = time.monotonic()
        st2, (ke, pe, dropped) = run_n(st)
        jax.block_until_ready(st2.lpos)
        n1 = int(jax.device_get(st2.alive.astype("int32").sum()))
        print(f"sched={sched} fused={fused}: cadences={Rs} steps={steps} "
              f"dropped={int(dropped)} n0={n0} n1={n1} "
              f"consistent={'OK' if n0 == n1 + int(dropped) else 'BAD'} "
              f"({time.monotonic()-t0:.0f}s)", flush=True)
