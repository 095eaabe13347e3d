"""Full-tile-row kron (one (121, B) build + one long-K dot per tile) and
bf16 G_all output for gather."""
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
    return (time.perf_counter() - t0) / n, out


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


# --- full-row deposit: block (G, B) lanes; kron (P^2, B) in one build ------

def _dep_row_kernel(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M,
                    mxu_dtype, G):
    def tile_body(g, _):
        sl = (pl.ds(g, 1), slice(None))
        wx = (ptl._weights_t(x_ref[sl], P, M)
              * val_ref[sl]).astype(mxu_dtype)        # (P, B)
        wyz = ptl._kron_iota(y_ref[sl], z_ref[sl], P, M, mxu_dtype)
        acc = jax.lax.dot_general(
            wx, wyz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def dep_row(xyz, value, mxu_dtype=jnp.bfloat16, tps=8):
    G = ptl._tiles_per_step(NT, tps)
    rs = lambda a: a.reshape(NT, B)
    pin = pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_dep_row_kernel, P=P, M=M, mxu_dtype=mxu_dtype, G=G),
        out_shape=jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
        grid=(NT // G,),
        in_specs=[pin, pin, pin, pin],
        out_specs=pl.BlockSpec((G, P, P * P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), rs(value))


# --- full-row gather -------------------------------------------------------

def _gat_row_kernel(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C,
                    mxu_dtype, G, gdtype):
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(mxu_dtype)
        sl = (pl.ds(g, 1), slice(None))
        wx = ptl._weights_t(x_ref[sl], P, M)           # (P, B)
        wyz = ptl._kron_iota(y_ref[sl], z_ref[sl], P, M, mxu_dtype)
        G_all = jax.lax.dot_general(
            E_all, wyz, (((1,), (0,)), ((), ())),
            preferred_element_type=gdtype)             # (C*P, B)
        for c in range(C):
            Gc = G_all[c * P:(c + 1) * P, :].astype(jnp.float32)
            out_ref[c, g, :] = jnp.sum(wx * Gc, axis=0)
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def gat_row(field_pad, xyz, mxu_dtype=jnp.bfloat16, tps=8,
            gdtype=jnp.float32):
    C = field_pad.shape[-1]
    G = ptl._tiles_per_step(NT, tps)
    rs = lambda a: a.reshape(NT, B)
    pin = pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
    out = pl.pallas_call(
        partial(_gat_row_kernel, P=P, M=M, C=C, mxu_dtype=mxu_dtype, G=G,
                gdtype=gdtype),
        out_shape=jax.ShapeDtypeStruct((C, NT, B), jnp.float32),
        grid=(NT // G,),
        in_specs=[pin, pin, pin,
                  pl.BlockSpec((G, C, P, P * P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, G, B), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), E)
    return out


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    xyz, val, fld = mk_inputs()

    base = chain_dep(lambda a, v: ptl.deposit(a, v, TS,
                                              mxu_dtype=jnp.bfloat16))
    dt, out_b = timeit(base, xyz, val)
    report("deposit bf16 current", dt)

    for tps in (8, 16, 32):
        dt, out_n = timeit(chain_dep(partial(dep_row, tps=tps)), xyz, val)
        report(f"deposit full-row G={tps}", dt)
    err = float(jnp.max(jnp.abs(out_n[0] - out_b[0])) /
                jnp.max(jnp.abs(out_b[0])))
    print(f"   rel err vs current: {err:.6f}")

    gbase = chain_gat(lambda f_, a: ptl.gather(f_, a, TS,
                                               mxu_dtype=jnp.bfloat16))
    dt, gout_b = timeit(gbase, fld, xyz)
    report("gather bf16 current", dt)

    for tps in (8, 16):
        dt, gout_n = timeit(chain_gat(partial(gat_row, tps=tps)), fld, xyz)
        report(f"gather full-row G={tps}", dt)
    err = float(jnp.max(jnp.abs(gout_n[0] - gout_b[0].reshape(3, NT, B))) /
                jnp.max(jnp.abs(gout_b[0])))
    print(f"   rel err vs current: {err:.6f}")

    dt, _ = timeit(chain_gat(partial(gat_row, gdtype=jnp.bfloat16)),
                   fld, xyz)
    report("gather full-row bf16 G_all", dt)


if __name__ == "__main__":
    main()


# --- int8 full-row deposit (proper chained timing) -------------------------

def _dep_row_kernel_q(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M, G):
    def tile_body(g, _):
        sl = (pl.ds(g, 1), slice(None))
        w = ptl._weights_t(x_ref[sl], P, M) * val_ref[sl]
        wx = jnp.round(w * 127.0).astype(jnp.int8)
        bbc = y_ref.shape[-1]
        j = jax.lax.broadcasted_iota(jnp.int32, (P * P, bbc), 0)
        yy = (j // P).astype(jnp.float32) - float(M)
        zz = (j % P).astype(jnp.float32) - float(M)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_ref[sl] - yy))
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(z_ref[sl] - zz))
        wyz = jnp.round(wy * wz * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            wx, wyz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        out_ref[pl.ds(g, 1), :, :] = (
            acc.astype(jnp.float32) * (1.0 / 16129.0))[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def dep_row_q(xyz, value, tps=8):
    G = ptl._tiles_per_step(NT, tps)
    rs = lambda a: a.reshape(NT, B)
    pin = pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_dep_row_kernel_q, P=P, M=M, G=G),
        out_shape=jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
        grid=(NT // G,),
        in_specs=[pin, pin, pin, pin],
        out_specs=pl.BlockSpec((G, P, P * P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), rs(value))


def main2():
    print(f"device: {jax.devices()[0]}", flush=True)
    xyz, val, fld = mk_inputs()
    dt, _ = timeit(chain_dep(partial(dep_row, tps=8)), xyz, val)
    report("deposit full-row bf16", dt)
    dt, _ = timeit(chain_dep(partial(dep_row_q, tps=8)), xyz, val)
    report("deposit full-row int8", dt)
