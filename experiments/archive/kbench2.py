"""Isolate: dispatch overhead, true chained kernel time, VPU vs MXU split."""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops.tiled import TileSpec

TS = TileSpec(grid=(128, 128, 128), T=8, M=1, B=9216)
NT, B, P, M = TS.NT, TS.B, TS.P, TS.M
SLOTS = NT * B


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))
    return x


def timeit(f, *args, n=5, warmup=2):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    dt = (time.perf_counter() - t0) / n
    return dt, out


def report(name, dt, per=1):
    print(f"{name:46s} {dt*1e3:8.2f} ms   {dt/per/SLOTS*1e9:6.3f} ns/slot",
          flush=True)


def mk_inputs(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    xyz = jax.random.uniform(ks[0], (3, NT, B), jnp.float32,
                             -float(M), float(TS.T + M))
    val = (jax.random.uniform(ks[1], (NT, B)) < 0.9).astype(jnp.float32)
    fld = jax.random.normal(ks[2], (NT, P, P, P, 3), jnp.float32)
    return xyz, val, fld


# --- variant kernels -------------------------------------------------------

def _deposit_kernel_constk(x_ref, y_ref, z_ref, val_ref, kron_ref, out_ref,
                           *, P, M, mxu_dtype, G):
    """matmul path only: kron read from input instead of VPU-built."""
    def tile_body(g, _):
        acc = jnp.zeros((P, P * P), jnp.float32)
        wyz = kron_ref[...]
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = (ptl._weights_t(x_ref[sl], P, M)
                  * val_ref[sl]).astype(mxu_dtype)
            acc = acc + jax.lax.dot_general(
                wx, wyz, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def deposit_constk(xyz, value, kron, ts, mxu_dtype=jnp.bfloat16, tps=8):
    bbc = ts.B // 8
    G = ptl._tiles_per_step(ts.NT, tps)
    rs = lambda a: a.reshape(ts.NT * 8, bbc)
    pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_deposit_kernel_constk, P=ts.P, M=ts.M, mxu_dtype=mxu_dtype,
                G=G),
        out_shape=jax.ShapeDtypeStruct((ts.NT, ts.P, ts.P * ts.P),
                                       jnp.float32),
        grid=(ts.NT // G,),
        in_specs=[pin, pin, pin, pin,
                  pl.BlockSpec((ts.P * ts.P, bbc), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, ts.P, ts.P * ts.P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), rs(value), kron)


def _deposit_kernel_novpu(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M,
                          mxu_dtype, G):
    """VPU path only: kron built, matmul replaced by a cheap reduction."""
    def tile_body(g, _):
        acc = jnp.zeros((P, P * P), jnp.float32)
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = (ptl._weights_t(x_ref[sl], P, M)
                  * val_ref[sl]).astype(mxu_dtype)
            wyz = ptl._kron_iota(y_ref[sl], z_ref[sl], P, M, mxu_dtype)
            # cheap consume: keep both live without an MXU pass
            acc = acc + (jnp.sum(wyz, axis=1, keepdims=True)[:, :1]
                         + jnp.sum(wx, axis=1, keepdims=True)[:1, :1]
                         ).astype(jnp.float32) * jnp.ones((P, P * P),
                                                          jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def deposit_novpu(xyz, value, ts, mxu_dtype=jnp.bfloat16, tps=8):
    bbc = ts.B // 8
    G = ptl._tiles_per_step(ts.NT, tps)
    rs = lambda a: a.reshape(ts.NT * 8, bbc)
    pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_deposit_kernel_novpu, P=ts.P, M=ts.M, mxu_dtype=mxu_dtype,
                G=G),
        out_shape=jax.ShapeDtypeStruct((ts.NT, ts.P, ts.P * ts.P),
                                       jnp.float32),
        grid=(ts.NT // G,),
        in_specs=[pin, pin, pin, pin],
        out_specs=pl.BlockSpec((G, ts.P, ts.P * ts.P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), rs(value))


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    xyz, val, fld = mk_inputs()

    # dispatch overhead: trivial op
    tiny = jax.jit(lambda x: x + 1.0)
    dt, _ = timeit(tiny, jnp.zeros((8, 128)), n=20)
    print(f"dispatch+sync overhead: {dt*1e3:.2f} ms", flush=True)

    # chained deposit inside one jit: true per-call cost
    R = 8

    @jax.jit
    def dep_chain(xyz, val):
        out = None
        v = val
        for i in range(R):
            t = ptl.deposit(xyz, v, TS, mxu_dtype=jnp.bfloat16)
            v = v + 0.0 * t[:, :1, 0]     # serialize: fake dependence
            out = t
        return out, v

    dt, _ = timeit(dep_chain, xyz, val, n=3)
    report(f"deposit bf16 chained x{R}", dt, per=R)

    @jax.jit
    def gat_chain(fld, xyz):
        v = xyz
        out = None
        for i in range(R):
            o = ptl.gather(fld, v, TS, mxu_dtype=jnp.bfloat16)
            v = v + 0.0 * o
            out = o
        return out, v

    dt, _ = timeit(gat_chain, fld, xyz, n=3)
    report(f"gather bf16 chained x{R}", dt, per=R)

    # MXU-only (const kron)
    kron = jnp.ones((P * P, B // 8), jnp.bfloat16)

    @jax.jit
    def dep_ck(xyz, val, kron):
        v = val
        out = None
        for i in range(R):
            t = deposit_constk(xyz, v, kron, TS)
            v = v + 0.0 * t[:, :1, 0]
            out = t
        return out, v
    dt, _ = timeit(dep_ck, xyz, val, kron, n=3)
    report(f"deposit MXU-only (const kron) x{R}", dt, per=R)

    # VPU-only (no matmul)
    @jax.jit
    def dep_nv(xyz, val):
        v = val
        out = None
        for i in range(R):
            t = deposit_novpu(xyz, v, TS)
            v = v + 0.0 * t[:, :1, 0]
            out = t
        return out, v
    dt, _ = timeit(dep_nv, xyz, val, n=3)
    report(f"deposit VPU-only (kron, no matmul) x{R}", dt, per=R)

    # f32 for reference
    @jax.jit
    def dep_f32(xyz, val):
        v = val
        out = None
        for i in range(R):
            t = ptl.deposit(xyz, v, TS, mxu_dtype=jnp.float32)
            v = v + 0.0 * t[:, :1, 0]
            out = t
        return out, v
    dt, _ = timeit(dep_f32, xyz, val, n=3)
    report(f"deposit f32 chained x{R}", dt, per=R)


if __name__ == "__main__":
    main()
