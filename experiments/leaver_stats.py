import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation

deck = open("/dev/stdin").read() if False else None
cfg = PincConfig.from_string("""
[time]
nTimeSteps = 10
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
mxuDtype = bf16
slack = 1.0625
""")
sim = TiledSimulation(cfg, seed=1)
ts = sim.ts
print(f"K (exchange cap) = {sim._exchange_cap}", file=sys.stderr)
run = sim.make_scan_steps(10)          # one cadence window, no rebucket at end? includes rebuckets per schedule
st, _ = run(sim.state)
# electron coords after 10 steps (pre-rebucket wander)
B = ts.B
L = B // 8
for s in range(2):
    x = np.asarray(st.lpos[s, 0]); alive = np.asarray(st.alive[s]) > 0.5
    r = x.reshape(ts.NT, 8, L)
    am = alive.reshape(ts.NT, 8, L)
    lm = ((r < 0) & am).sum(axis=2)      # per (tile, row) minus-leavers in x
    lp = ((r >= ts.T) & am).sum(axis=2)
    print(f"species {s}: x-minus per-row mean {lm.mean():.1f} max {lm.max()}, "
          f"plus mean {lp.mean():.1f} max {lp.max()}; per-tile max {lm.sum(1).max()}/{lp.sum(1).max()}")
