"""Heating-rate comparison: mega scan vs kernel-pair scan vs bf16/f32,
200 steps each from the same initial state."""
import sys, time
import os
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation

BASE = """
[time]
nTimeSteps = 200
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = 128,128,128
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 16 pc
nAlloc = 16 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.02,0.0005
drift = 0
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
[tiles]
tileSize = 8
slack = 1.0625
"""

N = int(os.environ.get("HEAT_N", "200"))

_sel = int(os.environ.get("HEAT_SEL", "0"))
variants = [("mega bf16", "mxuDtype = bf16\n"),
            ("pair bf16", "mxuDtype = bf16\nmega = false\n"),
            ("mega f32", "mxuDtype = f32\n")]
for name, extra in [variants[_sel]]:
    cfg = PincConfig.from_string(BASE + extra)
    t0 = time.monotonic()
    sim = TiledSimulation(cfg, seed=1)
    run_n = sim.make_scan_steps(N)
    st, (ke, pe, dropped) = run_n(sim.state)
    jax.block_until_ready(ke)
    ke = np.asarray(ke).sum(axis=1)
    pe = np.asarray(pe)
    tot = ke + pe
    rate = (tot[-1] - tot[10]) / tot[10] / (N - 10)
    print(f"{name:10s}: dE/E per step {rate:+.3e}  "
          f"dropped={int(dropped)}  E0={tot[0]:.5e}  E[-1]={tot[-1]:.5e}  "
          f"({time.monotonic()-t0:.0f}s)", flush=True)
    del sim, st
