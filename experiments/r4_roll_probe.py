#!/usr/bin/env python3
"""Round-4 probe: does a static sublane roll (jnp.roll axis=0 on an
(8, 128) f32 block) lower through Mosaic, and is it a bit copy?
Needed by the spill-merge passes in ops/pallas_gather_exchange.py."""
import sys; sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref, *, p):
    o_ref[...] = jnp.roll(x_ref[...], p, axis=0)


def run(p, interpret=False):
    x = np.random.default_rng(0).normal(size=(8, 128)).astype(np.float32)
    out = pl.pallas_call(
        partial(kernel, p=p),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(x))
    want = np.roll(x, p, axis=0)
    got = np.asarray(out)
    exact = (got.view(np.uint32) == want.view(np.uint32)).all()
    print(f"roll p={p}: exact={exact}")
    return exact


if __name__ == "__main__":
    ok = all(run(p) for p in range(8))
    print("ALL-EXACT" if ok else "MISMATCH")
