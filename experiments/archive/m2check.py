"""Isolate the M=2 kernel fault: pic_step + exchange at P=13 on small
and production shapes."""
import sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.ops.tiled import TileSpec

print("device:", jax.devices()[0], flush=True)

for NTB in [((8, 8, 8), 256), ((16, 16, 16), 8704)]:
    nt, B = NTB
    TS = TileSpec(grid=tuple(8 * n for n in nt), T=8, M=2, B=B)
    NT, P = TS.NT, TS.P
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    lpos = jax.random.uniform(ks[0], (2, 3, NT, B), jnp.float32, -1.5, 9.5)
    vel = 0.1 * jax.random.normal(ks[1], (2, 3, NT, B), jnp.float32)
    alive = (jax.random.uniform(ks[2], (2, NT, B)) < 0.9).astype(jnp.float32)
    ep5 = jax.random.normal(ks[3], (NT, 3, P, P * P), jnp.float32)
    out = jax.jit(lambda a, b, c, d: ptl.pic_step(
        d, a, b, c, (-1.0, 1.0), (-0.2, 0.0001), TS,
        mxu_dtype=jnp.bfloat16))(lpos, vel, alive, ep5)
    jax.block_until_ready(out[0])
    print(f"pic_step M=2 NT={NT} B={B}: ok "
          f"tiles_sum={float(out[0].sum()):.3f}", flush=True)

    planes = tuple(lpos[0, d] for d in range(3)) + tuple(
        vel[0, d] for d in range(3))
    pl2, al2, drop = jax.jit(lambda p, a: pex.rebucket_exchange_planes(
        p, a, nt, TS.T, 256))(planes, alive[0])
    jax.block_until_ready(al2)
    print(f"exchange M=2 NT={NT}: ok dropped={int(drop)}", flush=True)
print("ALL OK", flush=True)
