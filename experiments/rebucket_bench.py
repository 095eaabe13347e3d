import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation
from pinc_tpu.ops import pallas_exchange as pex

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
st = sim.state
ts = sim.ts
K = sim._exchange_cap
planes = tuple(st.lpos[0, d] for d in range(3)) + tuple(st.vel[0, d] for d in range(3))
al = st.alive[0].astype(jnp.float32)

def timeit(f, *args):
    o = f(*args); jax.block_until_ready(jax.tree.leaves(o)[0])
    t0 = time.monotonic(); o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    return time.monotonic() - t0, o

for rows, ks in [(False, None), (True, None), (True, 128)]:
    f = jax.jit(lambda p, a, rows=rows, ks=ks: pex.rebucket_exchange_planes(
        p, a, ts.ntiles, ts.T, K=K, rows=rows, ks=ks))
    t, (p2, a2, d) = timeit(f, planes, al)
    print(f"rows={rows} ks={ks}: {t*1e3:7.2f} ms  dropped={int(d)}")

REPS = 10
print("--- chained (in-jit scan, tunnel latency cancels) ---")
for rows, ks in [(False, None), (True, None)]:
    def chain(p, a, rows=rows, ks=ks):
        def body(c, _):
            p, a = c
            p2, a2, d = pex.rebucket_exchange_planes(
                p, a, ts.ntiles, ts.T, K=K, rows=rows, ks=ks)
            return (p2, a2), d
        return jax.lax.scan(body, (p, a), None, length=REPS)[1]
    f = jax.jit(chain)
    d = f(planes, al); jax.block_until_ready(d)
    t0 = time.monotonic(); d = f(planes, al); jax.block_until_ready(d)
    t = (time.monotonic() - t0) / REPS
    print(f"rows={rows} ks={ks}: {t*1e3:7.2f} ms/exchange dropped={int(d.sum())}")

for rows, ks in [(True, 128)]:
    def chain(p, a, rows=rows, ks=ks):
        def body(c, _):
            p, a = c
            p2, a2, d = pex.rebucket_exchange_planes(
                p, a, ts.ntiles, ts.T, K=K, rows=rows, ks=ks)
            return (p2, a2), d
        return jax.lax.scan(body, (p, a), None, length=REPS)[1]
    f = jax.jit(chain)
    d = f(planes, al); jax.block_until_ready(d)
    t0 = time.monotonic(); d = f(planes, al); jax.block_until_ready(d)
    t = (time.monotonic() - t0) / REPS
    print(f"rows={rows} ks={ks}: {t*1e3:7.2f} ms/exchange dropped={int(d.sum())}")
