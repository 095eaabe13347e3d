#!/usr/bin/env python3
"""Round-5: margin-2 Pallas fold probe.  Runs fold_global_t at M=2 on
hardware against the XLA fold reference, reporting compile errors /
mismatches, plus chained timings of both at 128^3.
Run: python experiments/r5_fold_m2.py [grid_n]
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.ops import tiled as tl
from pinc_tpu.ops import pallas_field as pfield
from pinc_tpu.tiled_sim import _jit
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64

for M in (1, 2):
    ts = tl.TileSpec(grid=(N, N, N), T=8, M=M, B=256, chunk=32)
    NT, P = ts.NT, ts.P
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.normal(size=(NT, P, P * P)).astype(np.float32))
    ref = tl.fold_to_global(tiles.reshape((NT,) + (P,) * 3), ts)
    ref_t = jnp.transpose(ref, (1, 0, 2))
    try:
        got = _jit(lambda t: pfield.fold_global_t(t, ts))(tiles)
        err = float(jnp.max(jnp.abs(got - ref_t)))
        print(f"M={M}: fold kernel max|err|={err:.3e} "
              f"{'OK' if err < 1e-4 else 'MISMATCH'}", flush=True)
    except Exception as e:
        print(f"M={M}: FOLD KERNEL FAILED: {type(e).__name__}", flush=True)
        print("  " + str(e).split(chr(10))[0][:300], flush=True)

# chained timing at 128^3 M=2 if it works
ts = tl.TileSpec(grid=(128, 128, 128), T=8, M=2, B=256, chunk=32)
NT, P = ts.NT, ts.P
tiles0 = jnp.zeros((NT, P, P * P), jnp.float32)


def chain(fold):
    @_jit
    def f(t0):
        def body(c, _):
            rho = fold(c)
            return c + 0.0 * rho[0, 0, 0], rho[0, 0, 0]
        return jax.lax.scan(body, t0, None, length=20)[1]
    return f


for name, fold in (
        ("xla ", lambda t: tl.fold_to_global(
            t.reshape((NT,) + (P,) * 3), ts)),
        ("plls", lambda t: pfield.fold_global_t(t, ts))):
    try:
        f = chain(fold)
        o = f(tiles0); jax.block_until_ready(o)
        t0 = time.monotonic()
        o = f(tiles0); jax.block_until_ready(o)
        print(f"fold {name} M=2 @128^3: {(time.monotonic()-t0)/20*1e3:6.2f} "
              f"ms", flush=True)
    except Exception as e:
        print(f"fold {name} M=2 @128^3 FAILED: "
              f"{str(e).split(chr(10))[0][:200]}", flush=True)
