#!/usr/bin/env python3
"""efield_tiles (Pallas) vs pad_tiles_cmajor(-gradient(phi)) (XLA) at the
official bench point, timed as in-jit chains (tunnel latency cancels).
Also cross-checks numerics on device.  Run: python experiments/field_kernel_bench.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from pinc_tpu.ops import tiled as tl
from pinc_tpu.ops.pallas_field import efield_tiles
from pinc_tpu.grid import gradient

N = 128
ts = tl.TileSpec(grid=(N,) * 3, T=8, M=1, B=128)
REPS = 50


def chain(op, x0):
    def body(c, _):
        x, s = c
        y = op(x)
        s2 = jnp.sum(y.ravel()[:8])
        return (x + 0.0 * s2.astype(x.dtype), s2), ()

    f = jax.jit(lambda x: jax.lax.scan(body, (x, jnp.float32(0)), None,
                                       length=REPS)[0][1])
    y = f(x0)
    jax.block_until_ready(y)
    t0 = time.monotonic()
    y = f(x0)
    jax.block_until_ready(y)
    return (time.monotonic() - t0) / REPS * 1e3


rng = np.random.default_rng(0)
phi = jnp.asarray(rng.normal(size=(N,) * 3).astype(np.float32))
print(f"device: {jax.devices()[0]}", file=sys.stderr)

want = jax.jit(lambda p: tl.pad_tiles_cmajor(-gradient(p), ts))(phi)
got = jax.jit(lambda p: efield_tiles(p, ts))(phi)
err = float(jnp.max(jnp.abs(want - got)))
print(f"max abs err vs XLA path: {err:.3e}", file=sys.stderr)
assert err < 1e-5, err

t_xla = chain(lambda p: tl.pad_tiles_cmajor(-gradient(p), ts), phi)
t_pal = chain(lambda p: efield_tiles(p, ts), phi)
print(f"xla grad+pad   {t_xla:7.3f} ms")
print(f"pallas efield  {t_pal:7.3f} ms")
