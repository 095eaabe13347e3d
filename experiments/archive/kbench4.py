"""bf16-native kron build + gather cost isolation."""
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


# --- bf16-native kron: f32 subtract, bf16 for abs/rsub/relu/mul ------------

def _kron_iota_bf(y_row, z_row, P, M):
    bbc = y_row.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (P * P, bbc), 0)
    yy = (j // P).astype(jnp.float32) - float(M)
    zz = (j % P).astype(jnp.float32) - float(M)
    one = jnp.bfloat16(1.0)
    zero = jnp.bfloat16(0.0)
    dy = (y_row - yy).astype(jnp.bfloat16)
    dz = (z_row - zz).astype(jnp.bfloat16)
    wy = jnp.maximum(zero, one - jnp.abs(dy))
    wz = jnp.maximum(zero, one - jnp.abs(dz))
    return wy * wz


def _weights_t_bf(row, P, M, val=None):
    bbc = row.shape[-1]
    nodes = jax.lax.broadcasted_iota(jnp.int32, (P, bbc), 0)
    nodes = nodes.astype(jnp.float32) - float(M)
    d = (row - nodes).astype(jnp.bfloat16)
    w = jnp.maximum(jnp.bfloat16(0.0), jnp.bfloat16(1.0) - jnp.abs(d))
    if val is not None:
        w = w * val.astype(jnp.bfloat16)
    return w


def _deposit_kernel_bf(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M, G):
    def tile_body(g, _):
        acc = jnp.zeros((P, P * P), jnp.float32)
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = _weights_t_bf(x_ref[sl], P, M, val=val_ref[sl])
            wyz = _kron_iota_bf(y_ref[sl], z_ref[sl], P, M)
            acc = acc + jax.lax.dot_general(
                wx, wyz, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def mk_dep(kernel, tps=8, extra=()):
    def f(xyz, value):
        bbc = TS.B // 8
        G = ptl._tiles_per_step(NT, tps)
        rs = lambda a: a.reshape(NT * 8, bbc)
        pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            partial(kernel, P=P, M=M, G=G),
            out_shape=jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
            grid=(NT // G,),
            in_specs=[pin, pin, pin, pin],
            out_specs=pl.BlockSpec((G, P, P * P), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(rs(xyz[0]), rs(xyz[1]), rs(xyz[2]), rs(value))
    return f


# --- gather bf16-native build ----------------------------------------------

def _gather_kernel_bf(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C, G):
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(jnp.bfloat16)
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = ptl._weights_t(x_ref[sl], P, M)
            wyz = _kron_iota_bf(y_ref[sl], z_ref[sl], P, M)
            G_all = jax.lax.dot_general(
                E_all, wyz, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for c in range(C):
                Gc = G_all[c * P:(c + 1) * P, :]
                out_ref[c, g, r, :] = jnp.sum(wx * Gc, axis=0)
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


# --- gather without the wx reduction (isolate dot) -------------------------

def _gather_kernel_nored(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C, G):
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(jnp.bfloat16)
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wyz = ptl._kron_iota(y_ref[sl], z_ref[sl], P, M, jnp.bfloat16)
            G_all = jax.lax.dot_general(
                E_all, wyz, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for c in range(C):
                out_ref[c, g, r, :] = G_all[c * P, :]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


# --- gather with transposed dot: wyz(121,BBC) as LHS^T  --------------------

def _gather_kernel_tdot(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C, G):
    """contract over the kron's SUBLANE dim via dot(wyz^T-style):
    G_all(BBC?, ...) -- try (wyz^T @ E_all^T) ordering:
    dot(wyz (P^2,BBC) as K x N with E (C*P, P^2): same as current.
    Instead: dot_general(wyz, E_allT) with contraction on dim0 x dim0:
    out (BBC, C*P) -- outputs particle-major."""
    def tile_body(g, _):
        E_allT = e_ref[g, :, :, :].reshape(C * P, P * P).astype(jnp.bfloat16)
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = ptl._weights_t(x_ref[sl], P, M)
            wyz = ptl._kron_iota(y_ref[sl], z_ref[sl], P, M, jnp.bfloat16)
            G_all = jax.lax.dot_general(
                wyz, E_allT, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (BBC, C*P)
            for c in range(C):
                Gc = G_all[:, c * P:(c + 1) * P]      # (BBC, P)
                out_ref[c, g, r, :] = jnp.sum(wx.T * Gc, axis=1)
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def mk_gat(kernel, tps=8):
    def f(field_pad, xyz):
        C = field_pad.shape[-1]
        bbc = TS.B // 8
        G = ptl._tiles_per_step(NT, tps)
        rs = lambda a: a.reshape(NT * 8, bbc)
        pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
        out = pl.pallas_call(
            partial(kernel, P=P, M=M, C=C, G=G),
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

    base = chain_dep(lambda a, v: ptl.deposit(a, v, TS,
                                              mxu_dtype=jnp.bfloat16))
    dt, out_b = timeit(base, xyz, val)
    report("deposit bf16 current", dt)

    dt, out_n = timeit(chain_dep(mk_dep(_deposit_kernel_bf)), xyz, val)
    report("deposit bf16-native build", dt)
    err = float(jnp.max(jnp.abs(out_n[0] - out_b[0])) /
                jnp.max(jnp.abs(out_b[0])))
    print(f"   rel err vs current: {err:.5f}")

    gbase = chain_gat(lambda f_, a: ptl.gather(f_, a, TS,
                                               mxu_dtype=jnp.bfloat16))
    dt, gout_b = timeit(gbase, fld, xyz)
    report("gather bf16 current", dt)

    dt, gout_n = timeit(chain_gat(mk_gat(_gather_kernel_bf)), fld, xyz)
    report("gather bf16-native build", dt)
    err = float(jnp.max(jnp.abs(gout_n[0] - gout_b[0])) /
                jnp.max(jnp.abs(gout_b[0])))
    print(f"   rel err vs current: {err:.5f}")

    dt, _ = timeit(chain_gat(mk_gat(_gather_kernel_nored)), fld, xyz)
    report("gather no-reduce (isolate dot)", dt)

    dt, _ = timeit(chain_gat(mk_gat(_gather_kernel_tdot)), fld, xyz)
    report("gather transposed dot", dt)


if __name__ == "__main__":
    main()
