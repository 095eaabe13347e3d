"""Decompose the production step: fused step alone, rebucket per species,
fold/pad/FFT pieces."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation
from pinc_tpu.ops import tiled as tl

deck = """
[time]
nTimeSteps = 20
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
slack = 1.125
"""

def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(np.asarray(leaves[0]).ravel()[:1]
               if isinstance(leaves[0], np.ndarray) else
               leaves[0].ravel()[:1]))
    return x

def timeit(f, *args, n=3, warmup=1):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    return (time.perf_counter() - t0) / n, out

t0 = time.monotonic()
cfg = PincConfig.from_string(deck)
sim = TiledSimulation(cfg, seed=1)
print(f"setup {time.monotonic()-t0:.0f}s; fused={sim._use_fused}; "
      f"rebucket_every={sim.rebucket_every_s}; K={sim._exchange_cap}",
      flush=True)

st = sim.state

# chained steps (no rebucket)
R = 5
@jax.jit
def steps(st):
    for _ in range(R):
        st, rho, phi, E, d = sim._tiled_step(st)
    return st, d
dt, (st2, d) = timeit(steps, st)
print(f"fused step: {dt/R*1e3:8.2f} ms", flush=True)

# rebucket per species
@jax.jit
def rb_e(st):
    st, dn = sim._rebucket(st, species=(0,))
    return st, dn
@jax.jit
def rb_i(st):
    st, dn = sim._rebucket(st, species=(1,))
    return st, dn
dt, _ = timeit(rb_e, st2)
print(f"rebucket electrons: {dt*1e3:8.2f} ms", flush=True)
dt, _ = timeit(rb_i, st2)
print(f"rebucket ions:      {dt*1e3:8.2f} ms", flush=True)

# pieces: solve, fold, pad
ts = sim.ts
tiles = jnp.zeros((ts.NT, ts.P, ts.P * ts.P), jnp.float32)
@jax.jit
def fold(t):
    return tl.fold_to_global(t.reshape((ts.NT,) + (ts.P,) * 3), ts)
dt, rho = timeit(fold, tiles)
print(f"fold_to_global:     {dt*1e3:8.2f} ms", flush=True)

@jax.jit
def solve(r):
    return sim.solver(r)
dt, phi = timeit(solve, rho)
print(f"poisson solve:      {dt*1e3:8.2f} ms", flush=True)

from pinc_tpu.grid import gradient
@jax.jit
def grad_pad(p):
    E = -gradient(p)
    return tl.pad_tiles(E, ts)
dt, _ = timeit(grad_pad, phi)
print(f"gradient+pad_tiles: {dt*1e3:8.2f} ms", flush=True)

@jax.jit
def aliveconv(st):
    return [st.alive[s].astype(jnp.float32) for s in range(2)]
dt, _ = timeit(aliveconv, st2)
print(f"alive->f32 x2:      {dt*1e3:8.2f} ms", flush=True)
