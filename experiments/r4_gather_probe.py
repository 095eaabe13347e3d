#!/usr/bin/env python3
"""Round-4 feasibility probe: does Mosaic lower a dynamic lane gather
(jnp.take_along_axis along the minor axis) inside a Pallas TPU kernel?

If yes, the exchange kernels' one-hot selection matmuls (the 3-pass
bit-exact payload dots and their (W, L) VPU compare builds — the
dominant exchange cost) collapse into bit-exact register shuffles:

* merge:   out[l] = arrivals[frank[l]]            (direct gather)
* extract: src[k] = searchsorted(cumsum, k+1)     (log2(L) gathers)
           buf[k] = pay[src[k]]                   (payload gather)

Run: python experiments/r4_gather_probe.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def probe(name, build):
    try:
        f = build()
        out = jax.block_until_ready(f())
        log(f"PASS {name}: out[0,:4]={np.asarray(out)[0,:4]}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        log(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


L, W = 2176, 768
rng = np.random.default_rng(0)
pay_np = rng.normal(size=(8, L)).astype(np.float32)
idx_np = rng.integers(0, L, size=(8, W)).astype(np.int32)
idx_small_np = rng.integers(0, W, size=(8, L)).astype(np.int32)


# 1) take_along_axis: big source (8, L), small idx (8, W)  [extract shape]
def build_taa_extract():
    def kern(p_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(p_ref[:], i_ref[:], axis=1)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda: f(jnp.asarray(pay_np), jnp.asarray(idx_np)))


# 2) take_along_axis: small source (8, W), big idx (8, L)  [merge shape]
def build_taa_merge():
    def kern(p_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(p_ref[:, :W], i_ref[:], axis=1)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda: f(jnp.asarray(pay_np[:, :W]),
                             jnp.asarray(idx_small_np)))


# 3) square same-shape gather (8, L) from (8, L)
def build_taa_square():
    idx_sq = rng.integers(0, L, size=(8, L)).astype(np.int32)

    def kern(p_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(p_ref[:], i_ref[:], axis=1)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda: f(jnp.asarray(pay_np), jnp.asarray(idx_sq)))


# 4) gather along SUBLANES (axis 0): (L8, 128) source, permute rows
def build_taa_sublane():
    src = rng.normal(size=(64, 128)).astype(np.float32)
    idx = rng.integers(0, 64, size=(64, 128)).astype(np.int32)

    def kern(p_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(p_ref[:], i_ref[:], axis=0)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda: f(jnp.asarray(src), jnp.asarray(idx)))


ok_e = probe("take_along_axis extract (8,2176)->(8,768)", build_taa_extract)
ok_m = probe("take_along_axis merge (8,768)->(8,2176)", build_taa_merge)
ok_s = probe("take_along_axis square (8,2176)", build_taa_square)
probe("take_along_axis sublane (64,128) axis=0", build_taa_sublane)

# correctness check vs numpy for whichever passed
if ok_e:
    f = build_taa_extract()
    got = np.asarray(f())
    want = np.take_along_axis(pay_np, idx_np, axis=1)
    log(f"extract exact: {np.array_equal(got, want)}")
if ok_m:
    f = build_taa_merge()
    got = np.asarray(f())
    want = np.take_along_axis(pay_np[:, :W], idx_small_np, axis=1)
    log(f"merge exact: {np.array_equal(got, want)}")

# timing at production scale: NT tiles of (8, L) -> (8, W) gather + back
if ok_e and ok_m:
    NT = 4096

    def kern2(p_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(p_ref[0], i_ref[0], axis=1)

    row = lambda shp: pl.BlockSpec((1,) + shp, lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    gat = pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct((NT, 8, W), jnp.float32),
        grid=(NT,),
        in_specs=[row((8, L)), row((8, W))],
        out_specs=row((8, W)),
    )
    pay = jnp.asarray(np.broadcast_to(pay_np, (NT, 8, L)).copy())
    idx = jnp.asarray(np.broadcast_to(idx_np, (NT, 8, W)).copy())

    @jax.jit
    def chain(pay, idx):
        def body(c, _):
            out = gat(c, idx)
            # consume: fold back so XLA can't elide
            return c + 0.0 * jnp.pad(out, ((0, 0), (0, 0), (0, L - W))), 0
        return jax.lax.scan(body, pay, None, length=10)[0]

    r = jax.block_until_ready(chain(pay, idx))
    t0 = time.monotonic()
    r = jax.block_until_ready(chain(pay, idx))
    dt = (time.monotonic() - t0) / 10
    log(f"extract-shape gather at NT=4096: {dt*1e3:.2f} ms per pass "
        f"({dt/ (NT*8*W) * 1e9:.2f} ns/gathered-elem)")
