#!/usr/bin/env python3
"""Round-3: fused all-dims exchange (v5) vs sequential per-dim sweeps.

Measures one electron re-bucket at the production margin-2 point
(128^3, 32 ppc/species, B=18432, Ks=128): the per-dim path streams every
particle plane 3x; the fused path streams them once and routes
multi-axis movers in buffer space.
Run: python experiments/r3_exchange_fused.py [slack]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation, _jit
from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

SLACK = float(sys.argv[1]) if len(sys.argv) > 1 else 1.125

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
slack = {SLACK}
"""
cfg = PincConfig.from_string(deck)
sim = TiledSimulation(cfg, seed=1)
st = sim.state
ts = sim.ts
K = sim._exchange_cap
Ks = pex.default_row_cap(K, ts.B)
print(f"NT={ts.NT} B={ts.B} M={ts.M} K={K} Ks={Ks} "
      f"rows={sim._exchange_rows}", file=sys.stderr)

# advance a few steps so there are real leavers
sim.state = None
run_n = sim.make_scan_steps(8, donate=True)
st, _ = run_n(st)
jax.block_until_ready(st.lpos)

# keep only the electron planes; free the full state (HBM head room for
# three compiled exchange variants)
planes0 = tuple(jnp.copy(st.lpos[0][d]) for d in range(3)) + tuple(
    jnp.copy(st.vel[0][d]) for d in range(3))
alive0 = jnp.copy(st.alive[0])
del st, run_n
jax.block_until_ready(alive0)


def bench(name, fn):
    out = fn(planes0, alive0)
    jax.block_until_ready(out[1])
    n1 = int(jax.device_get(jnp.sum(out[1] > 0.5)))
    d = int(jax.device_get(out[2]))
    reps = 5
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn(planes0, alive0)
    jax.block_until_ready(out[1])
    dt = (time.monotonic() - t0) / reps
    print(f"{name}: {dt*1e3:8.1f} ms  (alive {n1}, dropped {d})",
          flush=True)
    return dt


perdim = _jit(lambda p, a: pex.rebucket_exchange_planes(
    p, a, ts.ntiles, ts.T, K, rows=True, fused=False))
fused = _jit(lambda p, a: pex.rebucket_exchange_planes(
    p, a, ts.ntiles, ts.T, K, rows=True, fused=True))
pertile = _jit(lambda p, a: pex.rebucket_exchange_planes(
    p, a, ts.ntiles, ts.T, K, rows=False, fused=False))

bench("per-dim rows (v4)", perdim)
bench("fused all-dims (v5)", fused)
bench("per-dim tiles (v3)", pertile)

# correctness cross-check on-device: multiset equality
p1, a1, d1 = perdim(planes0, alive0)
p2, a2, d2 = fused(planes0, alive0)
m1 = np.asarray(a1) > 0.5
m2 = np.asarray(a2) > 0.5
h1 = np.sort(sum(np.asarray(p)[m1] * w for p, w in
                 zip(p1, [7.1, 3.3, 5.5, 13.3, 1.7, 2.9])))
h2 = np.sort(sum(np.asarray(p)[m2] * w for p, w in
                 zip(p2, [7.1, 3.3, 5.5, 13.3, 1.7, 2.9])))
print(f"multiset match: {np.allclose(h1, h2, atol=1e-2)} "
      f"(n {m1.sum()} vs {m2.sum()}, dropped {int(d1)}/{int(d2)})",
      flush=True)
