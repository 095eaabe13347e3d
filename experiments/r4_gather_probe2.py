#!/usr/bin/env python3
"""Probe 2: which dynamic lane-gather shapes does Mosaic actually lower?
Hypothesis: tpu.dynamic_gather is vreg-local — (8, 128) blocks only.
"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, src_shape, idx_shape, idx_max, axis=1):
    rng = np.random.default_rng(0)
    src = rng.normal(size=src_shape).astype(np.float32)
    idx = rng.integers(0, idx_max, size=idx_shape).astype(np.int32)

    def kern(p_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(p_ref[:], i_ref[:], axis=axis)

    try:
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(idx_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        got = np.asarray(jax.jit(lambda: f(jnp.asarray(src),
                                           jnp.asarray(idx)))())
        want = np.take_along_axis(src, idx, axis=axis)
        print(f"PASS {name}: exact={np.array_equal(got, want)}", flush=True)
        return True
    except Exception as e:
        m = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {m}", flush=True)
        return False


probe("(8,128) lanes", (8, 128), (8, 128), 128)
probe("(8,256) lanes", (8, 256), (8, 256), 256)
probe("(16,128) lanes", (16, 128), (16, 128), 128)
probe("(8,128) int32 idx_max=8 sublane axis", (8, 128), (8, 128), 8, axis=0)
probe("(256,128) lanes", (256, 128), (256, 128), 128)
