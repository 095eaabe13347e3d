#!/usr/bin/env python3
"""Round-5: gather-exchange internal decomposition at the headline point
(128^3, B=17408, cap=512 -> Ks=128).  Times extract_compact / cleanup /
merge separately, plus variants, to find where the ~142 ms/species goes.
Run: python experiments/r5_exdecomp.py [grid_n]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation, _jit
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
st = sim.state
ts = sim.ts
print(f"NT={ts.NT} B={ts.B} M={ts.M} cap={sim._exchange_cap}",
      file=sys.stderr, flush=True)

from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.ops import pallas_gather_exchange as pgx

K = sim._exchange_cap
Ks = pgx.round_cap(pex.default_row_cap(K, ts.B))
KU = pgx.total_cap(Ks, K)
Ke = pgx.round_cap(max(128, Ks // 4))
print(f"Ks={Ks} KU={KU} Ke={Ke}", file=sys.stderr, flush=True)

s = 0
lp, lv, al = st.lpos[s], st.vel[s], st.alive[s]
planes = tuple(lp[d] for d in range(3)) + tuple(lv[d] for d in range(3))


def timeit(f, *args, reps=3):
    o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    t0 = time.monotonic()
    for _ in range(reps):
        o = f(*args)
        jax.block_until_ready(jax.tree.leaves(o)[0])
    return (time.monotonic() - t0) / reps


# 1. extract_compact alone
ex1 = _jit(lambda p, a: pgx.extract_compact_rows_g(a, p, KU, ts.T))
t = timeit(ex1, planes, al)
print(f"extract_compact (KU={KU}): {t*1e3:8.2f} ms", flush=True)

bufs, alive2 = ex1(planes, al)

# 2. cleanup (direction split) alone
cl1 = _jit(lambda b: pgx.cleanup_rows_g(b, Ks, ts.T, axes=(0, 1, 2)))
t = timeit(cl1, bufs)
print(f"cleanup 3-axis (W={KU}): {t*1e3:8.2f} ms", flush=True)

# 3. merge alone (production-shaped inc buffer)
Wx = 2 * Ks
Wy1 = Ks + Ke
KT = Wx + 2 * Wy1 + 2 * (Ks + 2 * Ke)
blocks = []
off = 0
for w in (Wx, 2 * Wy1, Ks, Ke, Ke, Ks, Ke, Ke):
    blocks.append((off, w))
    off += w
rng = np.random.default_rng(0)
# realistic arrival density: ~K leavers per tile spread over the blocks
inc_np = np.zeros((ts.NT, 7, 8, KT), np.float32)
n_arr = rng.poisson(K / 8, size=(ts.NT, 8))
for (boff, w) in blocks[:2]:
    pass
# fill the first blocks' prefixes with flagged arrivals
for ti in range(0, ts.NT, 64):        # sample fill (speed)
    for r in range(8):
        n = min(int(n_arr[ti, r]), Wx)
        inc_np[ti, 6, r, :n] = 1.0
        inc_np[ti, :6, r, :n] = rng.normal(size=(6, n))
inc = jnp.asarray(inc_np)
mg1 = _jit(lambda a, i, p: pgx.merge_rows_g(a, i, p, tuple(blocks)))
t = timeit(mg1, alive2, inc, planes)
print(f"merge (KT={KT}): {t*1e3:8.2f} ms", flush=True)

# 4. full fused exchange (reference point)
full = _jit(lambda p, a: pgx.rebucket_exchange_all_rows_g(
    p, a, ts.ntiles, ts.T, Ks, KU=KU))
t = timeit(full, planes, al)
print(f"full fused exchange: {t*1e3:8.2f} ms", flush=True)

# 5. the XLA glue between kernels (rolls, concats, shifts): full - parts
# measured implicitly.

# 6. one-hot fused exchange for comparison
oh = _jit(lambda p, a: pex.rebucket_exchange_all_rows(
    p, a, ts.ntiles, ts.T, Ks))
t = timeit(oh, planes, al)
print(f"one-hot fused exchange: {t*1e3:8.2f} ms", flush=True)
