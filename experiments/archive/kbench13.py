"""Decompose fold_to_global / pad_tiles cost: overlap-add vs interleave
transpose, at production size, chained."""
import sys, time
from functools import partial
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.ops import tiled as tl
from pinc_tpu.ops.tiled import TileSpec, _fold_axis

TS = TileSpec(grid=(128, 128, 128), T=8, M=1, B=8704)
NT, P, T = TS.NT, TS.P, TS.T
R = 10


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
tiles = jax.random.normal(k, (NT, P, P * P), jnp.float32)
E = jax.random.normal(k, (128, 128, 128, 3), jnp.float32)
phi = jax.random.normal(k, (128, 128, 128), jnp.float32)
print("device:", jax.devices()[0], flush=True)


def chain(f, x0):
    @jax.jit
    def run(x):
        y = None
        for i in range(R):
            y = f(x)
            x = x + 0.0 * jax.tree_util.tree_leaves(y)[0].ravel()[0]
        return y
    return run, x0


def fold_full(t):
    return tl.fold_to_global(t.reshape((NT,) + (P,) * 3), TS)


def fold_noT(t):
    x = t.reshape(TS.ntiles + (P,) * 3)
    for d in range(3):
        x = _fold_axis(x, tile_ax=d, node_ax=3 + d, ts=TS)
    return x  # blocked layout, no interleave transpose


def interleave_only(x6):
    x = jnp.transpose(x6, (0, 3, 1, 4, 2, 5))
    return x.reshape(TS.grid)


def pad_cm(EE):
    return tl.pad_tiles_cmajor(EE, TS)


def grad_only(p):
    from pinc_tpu.grid import gradient
    return -gradient(p)


x6 = jax.jit(fold_noT)(tiles)

for name, f, x in [("fold full", fold_full, tiles),
                   ("fold no-transpose", fold_noT, tiles),
                   ("interleave transpose", interleave_only, x6),
                   ("pad_tiles_cmajor", pad_cm, E),
                   ("gradient", grad_only, phi)]:
    run, x0 = chain(f, x)
    dt, _ = timeit(run, x0)
    print(f"{name:22s} {dt/R*1e3:7.2f} ms", flush=True)
