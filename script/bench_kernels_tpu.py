"""TPU per-stage benchmark of the Pallas PIC kernels at production size:
deposit and gather at 128^3, one species slab (NT=4096 tiles, B=12288),
swept over margin M (P = T+1+2M), MXU dtype, and kron build variant.

Timing: chained async dispatch — every call's input comes from a small
jitted push of the previous one (so no two calls see identical inputs and
the relay replay-cache can't fire), block_until_ready only at the end
(dispatch overhead overlaps compute).  Programs are small (no scan
wrapper): the remote-compile tunnel rejects large payloads (HTTP 413).

Usage: python script/bench_kernels_tpu.py [reps]
"""
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

from pinc_tpu.ops import tiled as tl  # noqa: E402
from pinc_tpu.ops.pallas_tiled import (_weights_t, _kron_rows,  # noqa: E402
                                       _tiles_per_step)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kron_iota(y_row, z_row, P, M, dtype):
    """(1,BBC)x2 -> (P*P, BBC) kron, built elementwise from iota rows (no
    sublane repeat/concat data movement)."""
    bbc = y_row.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (P * P, bbc), 0)
    yy = (j // P).astype(jnp.float32) - float(M)
    zz = (j % P).astype(jnp.float32) - float(M)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_row - yy))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(z_row - zz))
    return (wy * wz).astype(dtype)


def _dep_kernel(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M, dt, G, kron):
    def tile_body(g, _):
        acc = jnp.zeros((P, P * P), jnp.float32)
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = (_weights_t(x_ref[sl], P, M) * val_ref[sl]).astype(dt)
            if kron == "iota":
                wyz = _kron_iota(y_ref[sl], z_ref[sl], P, M, dt)
            else:
                wy = _weights_t(y_ref[sl], P, M).astype(dt)
                wz = _weights_t(z_ref[sl], P, M).astype(dt)
                wyz = _kron_rows(wy, wz, P)
            acc = acc + jax.lax.dot_general(
                wx, wyz, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def deposit_v(lpx, lpy, lpz, value, ts, kron, dt, G=8):
    NT, B = lpx.shape
    P = ts.P
    bbc = B // 8
    rs = lambda a: a.reshape(NT * 8, bbc)
    pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_dep_kernel, P=P, M=ts.M, dt=dt, G=G, kron=kron),
        out_shape=jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
        grid=(NT // G,),
        in_specs=[pin, pin, pin, pin],
        out_specs=pl.BlockSpec((G, P, P * P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(lpx), rs(lpy), rs(lpz), rs(value))


def _gat_kernel(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C, dt, G,
                kron, stack):
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(dt)
        rows = []
        for r in range(8):
            sl = (pl.ds(g * 8 + r, 1), slice(None))
            wx = _weights_t(x_ref[sl], P, M)
            if kron == "iota":
                wyz = _kron_iota(y_ref[sl], z_ref[sl], P, M, dt)
            else:
                wy = _weights_t(y_ref[sl], P, M).astype(dt)
                wz = _weights_t(z_ref[sl], P, M).astype(dt)
                wyz = _kron_rows(wy, wz, P)
            G_all = jax.lax.dot_general(
                E_all, wyz, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if stack:
                rows.append(jnp.stack(
                    [jnp.sum(wx * G_all[c * P:(c + 1) * P, :], axis=0)
                     for c in range(C)]))             # (C, bbc)
            else:
                for c in range(C):
                    out_ref[c, g, r, :] = jnp.sum(
                        wx * G_all[c * P:(c + 1) * P, :], axis=0)
        if stack:
            out_ref[:, g, :, :] = jnp.stack(rows, axis=1)   # (C, 8, bbc)
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def gather_v(E, lpx, lpy, lpz, ts, kron, stack, dt, G=8):
    NT, B = lpx.shape
    P = ts.P
    C = E.shape[1]
    bbc = B // 8
    rs = lambda a: a.reshape(NT * 8, bbc)
    pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_gat_kernel, P=P, M=ts.M, C=C, dt=dt, G=G, kron=kron,
                stack=stack),
        out_shape=jax.ShapeDtypeStruct((C, NT, 8, bbc), jnp.float32),
        grid=(NT // G,),
        in_specs=[pin, pin, pin,
                  pl.BlockSpec((G, C, P, P * P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, G, 8, bbc), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(lpx), rs(lpy), rs(lpz), E)


def timed(name, f, lp, vel, reps):
    """Chained async dispatch; returns ms/call (excl. the push cost, which
    is reported once as 'push')."""
    push = jax.jit(lambda a: a + vel)
    try:
        x = push(lp)
        out = f(x)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.monotonic()
    for _ in range(reps):
        x = push(x)
        out = f(x)
    jax.block_until_ready(out)
    ms = (time.monotonic() - t0) / reps * 1e3
    log(f"{name}: {ms:7.1f} ms/call")
    return ms


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    T, B, fill = 8, 12288, 8192
    NT = (128 // T) ** 3
    lp = jnp.asarray(rng.uniform(0, T, size=(3, NT, B)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 0.004, size=(3, NT, B))
                      .astype(np.float32))
    alive = np.zeros((NT, B), np.float32)
    alive[:, :fill] = 1.0
    value = jnp.asarray(alive)

    # push baseline (pure elementwise pass over the coordinate planes)
    push = jax.jit(lambda a: a + vel)
    x = push(lp); jax.block_until_ready(x)
    t0 = time.monotonic()
    for _ in range(reps):
        x = push(x)
    jax.block_until_ready(x)
    log(f"push baseline: {(time.monotonic()-t0)/reps*1e3:.1f} ms")

    for M in (2, 1):
        ts = tl.TileSpec(grid=(128, 128, 128), T=T, M=M, B=B, chunk=32)
        P = ts.P
        E = jnp.asarray(rng.normal(size=(NT, 3, P, P * P))
                        .astype(np.float32))
        for dt, dn in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            for kron in ("repeat", "iota"):
                timed(f"deposit M={M} P={P} {dn} {kron}",
                      lambda a: deposit_v(a[0], a[1], a[2], value, ts,
                                          kron, dt), lp, vel, reps)
            for kron, stack in (("repeat", False), ("iota", False),
                                ("iota", True)):
                timed(f"gather  M={M} P={P} {dn} {kron} stack={int(stack)}",
                      lambda a: gather_v(E, a[0], a[1], a[2], ts, kron,
                                         stack, dt), lp, vel, reps)


if __name__ == "__main__":
    main()
