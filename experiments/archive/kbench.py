"""Microbenchmarks for the tiled PIC Pallas kernels: current bf16 floor
vs int8-weight variants (and accumulation restructurings).

Run on the real chip:  python experiments/kbench.py
"""
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

# production shape: 128^3 grid, T=8, M=1 -> NT=4096 tiles, B=9216
TS = TileSpec(grid=(128, 128, 128), T=8, M=1, B=9216)
NT, B, P, M = TS.NT, TS.B, TS.P, TS.M
SLOTS = NT * B


def mk_inputs(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    xyz = jax.random.uniform(ks[0], (3, NT, B), jnp.float32,
                             -float(M), float(TS.T + M))
    val = (jax.random.uniform(ks[1], (NT, B)) < 0.9).astype(jnp.float32)
    fld = jax.random.normal(ks[2], (NT, P, P, P, 3), jnp.float32)
    return xyz, val, fld


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


def report(name, dt):
    print(f"{name:42s} {dt*1e3:8.2f} ms   {dt/SLOTS*1e9:6.3f} ns/slot")


# ---------------------------------------------------------------------------
# int8 deposit: wx = round(127*hat)*alive int8, wyz = round(127*wy*wz) int8,
# acc int32, final scale 1/127^2 applied outside (with charge).
# ---------------------------------------------------------------------------

def _weights_q(row, P, M, val=None):
    bbc = row.shape[-1]
    nodes = jax.lax.broadcasted_iota(jnp.int32, (P, bbc), 0)
    nodes = nodes.astype(jnp.float32) - float(M)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(row - nodes))
    if val is not None:
        w = w * val          # alive mask folded in f32 (int8 VPU mul is
    return jnp.round(w * 127.0).astype(jnp.int8)   # not legal in Mosaic)


def _kron_iota_q(y_row, z_row, P, M):
    bbc = y_row.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (P * P, bbc), 0)
    yy = (j // P).astype(jnp.float32) - float(M)
    zz = (j % P).astype(jnp.float32) - float(M)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_row - yy))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(z_row - zz))
    return jnp.round(wy * wz * 127.0).astype(jnp.int8)


def _deposit_kernel_q(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M, G):
    def tile_body(g, _):
        acc = jnp.zeros((P, P * P), jnp.int32)
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = _weights_q(x_ref[sl], P, M, val=val_ref[sl])
            wyz = _kron_iota_q(y_ref[sl], z_ref[sl], P, M)
            acc = acc + jax.lax.dot_general(
                wx, wyz, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        out_ref[pl.ds(g, 1), :, :] = (
            acc.astype(jnp.float32) * (1.0 / (127.0 * 127.0)))[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def deposit_q(xyz, value, ts, tiles_per_step=8):
    bbc = ts.B // 8
    G = ptl._tiles_per_step(ts.NT, tiles_per_step)
    rs = lambda a: a.reshape(ts.NT * 8, bbc)
    pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_deposit_kernel_q, P=ts.P, M=ts.M, G=G),
        out_shape=jax.ShapeDtypeStruct((ts.NT, ts.P, ts.P * ts.P),
                                       jnp.float32),
        grid=(ts.NT // G,),
        in_specs=[pin, pin, pin, pin],
        out_specs=pl.BlockSpec((G, ts.P, ts.P * ts.P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), rs(value))


# ---------------------------------------------------------------------------
# int8 gather: E quantized per-tile (scale = max|E| over padded tile), kron
# int8; accum int32 -> f32 * scale/127^2; wx f32 on the VPU reduction.
# ---------------------------------------------------------------------------

def _gather_kernel_q(x_ref, y_ref, z_ref, e_ref, s_ref, out_ref,
                     *, P, M, C, G):
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P)
        scale = s_ref[g, 0] * (1.0 / (127.0 * 127.0))
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = ptl._weights_t(x_ref[sl], P, M)
            wyz = _kron_iota_q(y_ref[sl], z_ref[sl], P, M)
            G_all = jax.lax.dot_general(
                E_all, wyz, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            for c in range(C):
                Gc = G_all[c * P:(c + 1) * P, :]
                out_ref[c, g, r, :] = jnp.sum(wx * Gc, axis=0) * scale
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def gather_q(field_pad, xyz, ts, tiles_per_step=8):
    NT, P = ts.NT, ts.P
    C = field_pad.shape[-1]
    bbc = ts.B // 8
    G = ptl._tiles_per_step(NT, tiles_per_step)
    rs = lambda a: a.reshape(NT * 8, bbc)
    pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
    amax = jnp.max(jnp.abs(E), axis=(1, 2, 3))            # (NT,)
    scale = jnp.maximum(amax, 1e-30)
    Eq = jnp.round(E * (127.0 / scale[:, None, None, None])
                   ).astype(jnp.int8)
    out = pl.pallas_call(
        partial(_gather_kernel_q, P=P, M=ts.M, C=C, G=G),
        out_shape=jax.ShapeDtypeStruct((C, NT, 8, bbc), jnp.float32),
        grid=(NT // G,),
        in_specs=[pin, pin, pin,
                  pl.BlockSpec((G, C, P, P * P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((G, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, G, 8, bbc), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), Eq, scale[:, None])
    return out.reshape(C, NT, B)


# ---------------------------------------------------------------------------
# deposit with two interleaved accumulators (break the acc chain)
# ---------------------------------------------------------------------------

def _deposit_kernel_2acc(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M,
                         mxu_dtype, G):
    def tile_body(g, _):
        acc0 = jnp.zeros((P, P * P), jnp.float32)
        acc1 = jnp.zeros((P, P * P), jnp.float32)
        for r in range(0, 8, 2):
            for k, acc in ((0, None), (1, None)):
                pass
            sl0 = (pl.ds(g * 8 + r, 1), slice(None))
            sl1 = (pl.ds(g * 8 + r + 1, 1), slice(None))
            wx0 = (ptl._weights_t(x_ref[sl0], P, M)
                   * val_ref[sl0]).astype(mxu_dtype)
            wyz0 = ptl._kron_iota(y_ref[sl0], z_ref[sl0], P, M, mxu_dtype)
            wx1 = (ptl._weights_t(x_ref[sl1], P, M)
                   * val_ref[sl1]).astype(mxu_dtype)
            wyz1 = ptl._kron_iota(y_ref[sl1], z_ref[sl1], P, M, mxu_dtype)
            acc0 = acc0 + jax.lax.dot_general(
                wx0, wyz0, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc1 = acc1 + jax.lax.dot_general(
                wx1, wyz1, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = (acc0 + acc1)[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def deposit_2acc(xyz, value, ts, mxu_dtype=jnp.bfloat16, tiles_per_step=8):
    bbc = ts.B // 8
    G = ptl._tiles_per_step(ts.NT, tiles_per_step)
    rs = lambda a: a.reshape(ts.NT * 8, bbc)
    pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_deposit_kernel_2acc, P=ts.P, M=ts.M, mxu_dtype=mxu_dtype,
                G=G),
        out_shape=jax.ShapeDtypeStruct((ts.NT, ts.P, ts.P * ts.P),
                                       jnp.float32),
        grid=(ts.NT // G,),
        in_specs=[pin, pin, pin, pin],
        out_specs=pl.BlockSpec((G, ts.P, ts.P * ts.P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), rs(value))


def main():
    print(f"device: {jax.devices()[0]}, slots = {SLOTS:,} "
          f"(NT={NT}, B={B}, P={P})")
    xyz, val, fld = mk_inputs()

    dep_bf16 = jax.jit(lambda a, v: ptl.deposit(a, v, TS,
                                                mxu_dtype=jnp.bfloat16))
    dt, out_ref_dep = timeit(dep_bf16, xyz, val)
    report("deposit bf16 (current)", dt)

    dt, out_q = timeit(jax.jit(lambda a, v: deposit_q(a, v, TS)), xyz, val)
    report("deposit int8", dt)
    err = jnp.max(jnp.abs(out_q - out_ref_dep)) / jnp.max(
        jnp.abs(out_ref_dep))
    print(f"   int8 vs bf16 deposit rel err: {float(err):.4f}")

    dt, _ = timeit(jax.jit(lambda a, v: deposit_2acc(a, v, TS)), xyz, val)
    report("deposit bf16 2-acc", dt)

    gat_bf16 = jax.jit(lambda f, a: ptl.gather(f, a, TS,
                                               mxu_dtype=jnp.bfloat16))
    dt, out_ref_g = timeit(gat_bf16, fld, xyz)
    report("gather bf16 (current)", dt)

    dt, out_gq = timeit(jax.jit(lambda f, a: gather_q(f, a, TS)), fld, xyz)
    report("gather int8", dt)
    err = jnp.max(jnp.abs(out_gq - out_ref_g)) / jnp.max(jnp.abs(out_ref_g))
    print(f"   int8 vs bf16 gather rel err: {float(err):.4f}")


if __name__ == "__main__":
    main()
