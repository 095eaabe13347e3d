"""Variants: batched kron-then-dot scheduling, per-component gather,
VPU-only ceiling, G sweep."""
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
R = 8


def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))
    return x


def timeit(f, *args, n=3, warmup=1):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    dt = (time.perf_counter() - t0) / n
    return dt, out


def report(name, dt, per=R):
    print(f"{name:46s} {dt/per*1e3:8.2f} ms   {dt/per/SLOTS*1e9:6.3f} "
          "ns/slot", flush=True)


def mk_inputs(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    xyz = jax.random.uniform(ks[0], (3, NT, B), jnp.float32,
                             -float(M), float(TS.T + M))
    val = (jax.random.uniform(ks[1], (NT, B)) < 0.9).astype(jnp.float32)
    fld = jax.random.normal(ks[2], (NT, P, P, P, 3), jnp.float32)
    return xyz, val, fld


def chain_dep(fn):
    @jax.jit
    def g(xyz, val):
        v = val
        out = None
        for i in range(R):
            t = fn(xyz, v)
            v = v + 0.0 * t[:, :1, 0]
            out = t
        return out, v
    return g


def chain_gat(fn):
    @jax.jit
    def g(fld, xyz):
        v = xyz
        out = None
        for i in range(R):
            o = fn(fld, v)
            v = v + 0.0 * o
            out = o
        return out, v
    return g


# --- deposit: batch the 8 krons first, then the 8 dots ---------------------

def _deposit_kernel_batched(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M,
                            mxu_dtype, G):
    def tile_body(g, _):
        wxs, wyzs = [], []
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wxs.append((ptl._weights_t(x_ref[sl], P, M)
                        * val_ref[sl]).astype(mxu_dtype))
            wyzs.append(ptl._kron_iota(y_ref[sl], z_ref[sl], P, M,
                                       mxu_dtype))
        acc = jnp.zeros((P, P * P), jnp.float32)
        for r in range(8):
            acc = acc + jax.lax.dot_general(
                wxs[r], wyzs[r], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


# --- deposit: one concatenated dot per tile (K = B) ------------------------

def _deposit_kernel_onedot(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M,
                           mxu_dtype, G):
    def tile_body(g, _):
        wxs, wyzs = [], []
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wxs.append((ptl._weights_t(x_ref[sl], P, M)
                        * val_ref[sl]).astype(mxu_dtype))
            wyzs.append(ptl._kron_iota(y_ref[sl], z_ref[sl], P, M,
                                       mxu_dtype))
        wx = jnp.concatenate(wxs, axis=1)       # (P, 8*BBC)
        wyz = jnp.concatenate(wyzs, axis=1)     # (P^2, 8*BBC)
        acc = jax.lax.dot_general(
            wx, wyz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def mk_dep(kernel, mxu_dtype=jnp.bfloat16, tps=8):
    def f(xyz, value):
        bbc = TS.B // 8
        G = ptl._tiles_per_step(NT, tps)
        rs = lambda a: a.reshape(NT * 8, bbc)
        pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(kernel, P=P, M=M, mxu_dtype=mxu_dtype, G=G),
            out_shape=jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
            grid=(NT // G,),
            in_specs=[pin, pin, pin, pin],
            out_specs=pl.BlockSpec((G, P, P * P), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), rs(value))
    return f


# --- VPU-only ceiling ------------------------------------------------------

def _deposit_kernel_vpuonly(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M,
                            mxu_dtype, G):
    def tile_body(g, _):
        acc = jnp.zeros((P, P * P), jnp.float32)
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = (ptl._weights_t(x_ref[sl], P, M)
                  * val_ref[sl]).astype(mxu_dtype)
            wyz = ptl._kron_iota(y_ref[sl], z_ref[sl], P, M, mxu_dtype)
            rsum = jnp.sum(wyz.astype(jnp.float32), axis=1)   # (P^2,)
            xsum = jnp.sum(wx.astype(jnp.float32), axis=1)    # (P,)
            acc = acc + xsum[:, None] + rsum[None, :]
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


# --- gather: batched krons then dots then reductions ----------------------

def _gather_kernel_batched(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C,
                           mxu_dtype, G):
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(mxu_dtype)
        wxs, wyzs = [], []
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wxs.append(ptl._weights_t(x_ref[sl], P, M))
            wyzs.append(ptl._kron_iota(y_ref[sl], z_ref[sl], P, M,
                                       mxu_dtype))
        Gs = [jax.lax.dot_general(
            E_all, wyzs[r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) for r in range(8)]
        for r in range(8):
            for c in range(C):
                Gc = Gs[r][c * P:(c + 1) * P, :]
                out_ref[c, g, r, :] = jnp.sum(wxs[r] * Gc, axis=0)
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


# --- gather: single dot with concatenated krons (N = 8*BBC) ----------------

def _gather_kernel_onedot(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C,
                          mxu_dtype, G):
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(mxu_dtype)
        wxs, wyzs = [], []
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wxs.append(ptl._weights_t(x_ref[sl], P, M))
            wyzs.append(ptl._kron_iota(y_ref[sl], z_ref[sl], P, M,
                                       mxu_dtype))
        wyz = jnp.concatenate(wyzs, axis=1)          # (P^2, 8*BBC)
        G_all = jax.lax.dot_general(
            E_all, wyz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (C*P, 8*BBC)
        bbc = x_ref.shape[-1]
        for r in range(8):
            blk = G_all[:, r * bbc:(r + 1) * bbc]
            for c in range(C):
                Gc = blk[c * P:(c + 1) * P, :]
                out_ref[c, g, r, :] = jnp.sum(wxs[r] * Gc, axis=0)
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def mk_gat(kernel, mxu_dtype=jnp.bfloat16, tps=8):
    def f(field_pad, xyz):
        C = field_pad.shape[-1]
        bbc = TS.B // 8
        G = ptl._tiles_per_step(NT, tps)
        rs = lambda a: a.reshape(NT * 8, bbc)
        pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
        out = pl.pallas_call(
            partial(kernel, P=P, M=M, C=C, mxu_dtype=mxu_dtype, G=G),
            out_shape=jax.ShapeDtypeStruct((C, NT, 8, bbc), jnp.float32),
            grid=(NT // G,),
            in_specs=[pin, pin, pin,
                      pl.BlockSpec((G, C, P, P * P), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((C, G, 8, bbc), lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), E)
        return out.reshape(C, NT, B)
    return f


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    xyz, val, fld = mk_inputs()

    dt, _ = timeit(chain_dep(
        lambda a, v: ptl.deposit(a, v, TS, mxu_dtype=jnp.bfloat16)),
        xyz, val)
    report("deposit bf16 current", dt)

    dt, _ = timeit(chain_dep(mk_dep(_deposit_kernel_batched)), xyz, val)
    report("deposit bf16 batched-krons", dt)

    dt, _ = timeit(chain_dep(mk_dep(_deposit_kernel_onedot)), xyz, val)
    report("deposit bf16 one-dot", dt)

    dt, _ = timeit(chain_dep(mk_dep(_deposit_kernel_vpuonly)), xyz, val)
    report("deposit VPU-only ceiling", dt)

    for tps in (16, 32):
        dt, _ = timeit(chain_dep(mk_dep(_deposit_kernel_batched, tps=tps)),
                       xyz, val)
        report(f"deposit bf16 batched G={tps}", dt)

    dt, _ = timeit(chain_gat(
        lambda f_, a: ptl.gather(f_, a, TS, mxu_dtype=jnp.bfloat16)),
        fld, xyz)
    report("gather bf16 current", dt)

    dt, _ = timeit(chain_gat(mk_gat(_gather_kernel_batched)), fld, xyz)
    report("gather bf16 batched-krons", dt)

    dt, _ = timeit(chain_gat(mk_gat(_gather_kernel_onedot)), fld, xyz)
    report("gather bf16 one-dot", dt)

    for tps in (16, 32):
        dt, _ = timeit(chain_gat(mk_gat(_gather_kernel_batched, tps=tps)),
                       fld, xyz)
        report(f"gather bf16 batched G={tps}", dt)


if __name__ == "__main__":
    main()
