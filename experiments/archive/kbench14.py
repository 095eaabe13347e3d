"""Fusible reformulations: concat-based fold overlap-add and slice-based
gradient, vs the current versions."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.ops import tiled as tl
from pinc_tpu.ops.tiled import TileSpec, _fold_axis

TS = TileSpec(grid=(128, 128, 128), T=8, M=1, B=8704)
NT, P, T, M = TS.NT, TS.P, TS.T, TS.M
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


def chain(f):
    @jax.jit
    def run(x):
        y = None
        for i in range(R):
            y = f(x)
            x = x + 0.0 * jax.tree_util.tree_leaves(y)[0].ravel()[0]
        return y
    return run


def _fold_axis_v2(x, tile_ax, node_ax, roll_fn=None):
    """Concat-based overlap-add: no dynamic-update-slice copies."""
    roll = roll_fn or (lambda a, s, ax: jnp.roll(a, s, axis=ax))
    sl = lambda a, b: jax.lax.slice_in_dim(x, a, b, axis=node_ax)
    core = sl(M, M + T)                                   # offsets 0..T-1
    low = roll(sl(0, M), -1, tile_ax)                     # -> prev tile T-M..T-1
    high = roll(sl(T + M, 2 * M + T + 1), 1, tile_ax)     # -> next tile 0..M
    z = jnp.zeros_like(jax.lax.slice_in_dim(core, 0, T - M, axis=node_ax))
    lowpad = jnp.concatenate(
        [jnp.zeros_like(jax.lax.slice_in_dim(core, 0, T - M, axis=node_ax)),
         low], axis=node_ax)
    highpad = jnp.concatenate(
        [high, jnp.zeros_like(
            jax.lax.slice_in_dim(core, 0, T - M - 1, axis=node_ax))],
        axis=node_ax)
    return core + lowpad + highpad


def fold_v2(t):
    x = t.reshape(TS.ntiles + (P,) * 3)
    for d in range(3):
        x = _fold_axis_v2(x, d, 3 + d)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))
    return x.reshape(TS.grid)


def fold_v1(t):
    return tl.fold_to_global(t.reshape((NT,) + (P,) * 3), TS)


def grad_v1(p):
    from pinc_tpu.grid import gradient
    return -gradient(p)


def grad_v2(p):
    pp = jnp.pad(p, 1, mode="wrap")
    comps = []
    for d in range(3):
        slc_p = [slice(1, -1)] * 3
        slc_m = [slice(1, -1)] * 3
        slc_p[d] = slice(2, None)
        slc_m[d] = slice(0, -2)
        comps.append(-0.5 * (pp[tuple(slc_p)] - pp[tuple(slc_m)]))
    return jnp.stack(comps, axis=-1)


k = jax.random.PRNGKey(0)
tiles = jax.random.normal(k, (NT, P, P * P), jnp.float32)
phi = jax.random.normal(k, (128, 128, 128), jnp.float32)
print("device:", jax.devices()[0], flush=True)

r1 = jax.jit(fold_v1)(tiles)
r2 = jax.jit(fold_v2)(tiles)
print("fold v2 err:", float(jnp.max(jnp.abs(r1 - r2))), flush=True)
g1 = jax.jit(grad_v1)(phi)
g2 = jax.jit(grad_v2)(phi)
print("grad v2 err:", float(jnp.max(jnp.abs(g1 - g2))), flush=True)

for name, f, x in [("fold v1 (at[].add)", fold_v1, tiles),
                   ("fold v2 (concat)", fold_v2, tiles),
                   ("grad v1 (roll)", grad_v1, phi),
                   ("grad v2 (pad+slice)", grad_v2, phi)]:
    dt, _ = timeit(chain(f), x)
    print(f"{name:22s} {dt/R*1e3:7.2f} ms", flush=True)
