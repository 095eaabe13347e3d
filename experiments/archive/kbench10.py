"""Per-phase chained timing of the exchange re-bucket at production size
(one species, one dim) for K in {64, 128, 256}."""
import sys, time
from functools import partial
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.ops import pallas_exchange as pex

NT, B, T = 4096, 9216, 8
R = 6


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))
    return x


def timeit(f, *args, n=3, warmup=1):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    return (time.perf_counter() - t0) / n, out


k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 8)
planes = tuple(
    jax.random.uniform(ks[i], (NT, B), jnp.float32, -0.5, T + 0.5)
    if i < 3 else jax.random.normal(ks[i], (NT, B)) * 0.02
    for i in range(6))
alive = (jax.random.uniform(ks[6], (NT, B)) < 0.89).astype(jnp.float32)
print("device:", jax.devices()[0], flush=True)
frac_lm = float(jnp.mean((alive > 0) & (planes[0] < 0)))
print(f"leaver frac per face: {frac_lm:.4f} -> mean/row "
      f"{frac_lm*B:.0f}", flush=True)


def rank_of(coord, alive, K):
    al = alive > 0.5
    lm = al & (coord < 0.0)
    lp = al & (coord >= float(T))
    rm = jnp.cumsum(lm.astype(jnp.int32), axis=1) - 1
    rp = jnp.cumsum(lp.astype(jnp.int32), axis=1) - 1
    rank = jnp.where(lm & (rm < K), rm,
                     jnp.where(lp & (rp < K), K + rp, -1)).astype(jnp.int32)
    kill = (lm & (rm >= K)) | (lp & (rp >= K))
    return jnp.where(kill, 2 * K, rank)


def frank_of(alive):
    free = ~(alive > 0.5)
    fr = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
    return jnp.where(free, fr, -1).astype(jnp.int32)


for K in (64, 128, 256):
    rank = jax.jit(partial(rank_of, K=K))(planes[0], alive)
    bufs, alive2 = jax.jit(partial(pex.extract, K2=2 * K))(
        rank, alive, planes)
    frank = jax.jit(frank_of)(alive2)

    @jax.jit
    def extract_chain(rank, alive, planes):
        out = None
        a = alive
        for i in range(R):
            bufs, a2 = pex.extract(rank, a, planes, 2 * K)
            a = jnp.where(a2 + bufs[0, 0, 0] > 42.0, a, a2)  # dep chain
            out = bufs
        return out, a

    @jax.jit
    def merge_chain(frank, alive, inc, planes):
        out = None
        pl = planes
        for i in range(R):
            pl, a = pex.merge(frank, alive, inc, pl)
        return pl, a

    dt_e, _ = timeit(extract_chain, rank, alive, planes)
    dt_m, _ = timeit(merge_chain, frank, alive2, bufs, planes)
    print(f"K={K:4d}  extract {dt_e/R*1e3:7.2f} ms   "
          f"merge {dt_m/R*1e3:7.2f} ms", flush=True)

# full dim sweep chained, production K
for K in (64, 128, 256):
    @jax.jit
    def dim_chain(planes, alive):
        pl, al = planes, alive
        for d in range(3):
            pl, al = pex.exchange_dim(pl, al, (16, 16, 16), d, T, K)
        return pl, al
    dt, _ = timeit(dim_chain, planes, alive, n=2)
    print(f"K={K:4d}  full 3-dim exchange {dt*1e3:8.1f} ms", flush=True)
