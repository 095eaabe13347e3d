"""pic_step kernel tuning: tiles_per_step G, and an exchange timing at
K=128 with the current kernels (chained)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.ops.tiled import TileSpec

TS = TileSpec(grid=(128, 128, 128), T=8, M=1, B=8704)
NT, B, P, M = TS.NT, TS.B, TS.P, TS.M
S = 2
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
ks = jax.random.split(k, 6)
lpos = jax.random.uniform(ks[0], (S, 3, NT, B), jnp.float32, -1.0, 9.0)
vel = 0.004 * jax.random.normal(ks[1], (S, 3, NT, B), jnp.float32)
alive = (jax.random.uniform(ks[2], (S, NT, B)) < 0.94).astype(jnp.float32)
ep5 = jax.random.normal(ks[3], (NT, 3, P, P * P), jnp.float32)
charge = (-1.0, 1.0)
qm = (-0.2, 0.2 / 1836)

print("device:", jax.devices()[0], flush=True)

for G in (8, 16, 32):
    @jax.jit
    def chain(lpos, vel, alive, ep5):
        lp, v = lpos, vel
        out = None
        for i in range(R):
            tiles, lp, v, vdot, nout = ptl.pic_step(
                ep5, lp, v, alive, charge, qm, TS,
                mxu_dtype=jnp.bfloat16, tiles_per_step=G)
            out = tiles
        return out, lp, v
    dt, _ = timeit(chain, lpos, vel, alive, ep5)
    print(f"pic_step G={G:3d}: {dt/R*1e3:7.2f} ms "
          f"({dt/R/(S*NT*B)*1e9:6.3f} ns/slot)", flush=True)

# exchange timing at K=128 with current kernels
planes = tuple(lpos[0, d] for d in range(3)) + tuple(vel[0, d]
                                                     for d in range(3))
@jax.jit
def exch(planes, al):
    out = None
    pl2, a = planes, al
    for i in range(2):
        pl2, a, drop = pex.rebucket_exchange_planes(
            pl2, a, (16, 16, 16), TS.T, 128)
    return pl2, a, drop
dt, (_, _, drop) = timeit(exch, planes, alive[0], n=2)
print(f"full exchange K=128 x2: {dt/2*1e3:7.1f} ms "
      f"(dropped {int(jax.device_get(drop))})", flush=True)
