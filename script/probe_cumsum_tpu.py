"""Probe: does jnp.cumsum along the lane axis lower inside a Pallas TPU
kernel, and what does it cost at (1, 12288)?"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(x_ref, o_ref):
    x = x_ref[0, :, :]                       # (8, B)
    c = jnp.cumsum(x.astype(jnp.int32), axis=-1)
    o_ref[0, :, :] = c.astype(jnp.float32)


def main():
    B = 12288
    NT = 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.uniform(size=(NT, 8, B)) < 0.02)
                    .astype(np.float32))
    f = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((NT, 8, B), jnp.float32),
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    try:
        out = jax.jit(f)(x)
        jax.block_until_ready(out)
    except Exception as e:
        log(f"cumsum-in-pallas FAILED: {type(e).__name__}: {e}")
        return
    ref = np.cumsum(np.asarray(x), axis=-1)
    ok = np.allclose(np.asarray(out), ref)
    log(f"cumsum-in-pallas OK, correct={ok}")

    @jax.jit
    def chain(x):
        def body(c, _):
            x, acc = c
            o = f(x)
            return (x + 1.0, acc + o[0, 0, -1]), None
        (x, acc), _ = jax.lax.scan(body, (x, jnp.zeros(())), None, length=4)
        return acc

    acc = chain(x); jax.block_until_ready(acc)
    t0 = time.monotonic()
    acc = chain(x); jax.block_until_ready(acc)
    dt = (time.monotonic() - t0) / 4
    log(f"cumsum kernel (NT=4096 x 8 x 12288): {dt*1e3:.1f} ms/pass "
        f"(HBM floor ~{2*NT*8*B*4/220e9*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
