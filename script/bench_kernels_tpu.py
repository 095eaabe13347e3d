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


def timed(name, f, args, reps):
    """Time f via an in-jit scan whose carry evolves and whose outputs are
    all consumed into a scalar — the only pattern that defeats both the
    relay's replay cache AND its lazy per-call dispatch (externally-timed
    chained calls read 0.1 ms).

    f(lp, *rest) -> array; args = (lp, vel, *rest).  CRITICAL: rest must
    be threaded as jit ARGUMENTS (closed-over device arrays become HLO
    constants and the remote-compile tunnel serializes them: HTTP 413)."""
    def run(lp, vel, *rest):
        def body(carry, _):
            lp, acc = carry
            out = f(lp, *rest)
            return (lp + vel, acc + jnp.sum(out)), None
        (lp, acc), _ = jax.lax.scan(body, (lp, jnp.zeros(())), None,
                                    length=reps)
        return acc

    rj = jax.jit(run)
    try:
        acc = rj(*args)
        jax.block_until_ready(acc)
    except Exception as e:  # noqa: BLE001
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return None
    t0 = time.monotonic()
    acc = rj(*args)
    jax.block_until_ready(acc)
    ms = (time.monotonic() - t0) / reps * 1e3
    log(f"{name}: {ms:7.1f} ms/call (sum={float(acc):.3e})")
    return ms


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    log(f"device: {jax.devices()[0]}")
    T, B, fill = 8, 12288, 8192
    NT = (128 // T) ** 3

    # all test data generated ON DEVICE: the axon tunnel uploads host
    # arrays at WAN speed (1.4 GB took >25 min), jax.random costs nothing
    @jax.jit
    def gen():
        k = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(k, 3)
        lp = jax.random.uniform(k1, (3, NT, B), jnp.float32, 0.0, float(T))
        vel = 0.004 * jax.random.normal(k2, (3, NT, B), jnp.float32)
        value = (jnp.arange(B)[None, :] < fill).astype(
            jnp.float32) * jnp.ones((NT, 1), jnp.float32)
        E = jax.random.normal(k3, (NT, 3, 13, 13 * 13), jnp.float32)
        return lp, vel, value, E

    lp, vel, value, E13 = gen()
    jax.block_until_ready(lp)
    log("device data ready")

    # push baseline (pure elementwise pass over the coordinate planes)
    timed("push baseline", lambda a: a[:1, :1, :1] * 0.0, (lp, vel), reps)

    cases = [
        # (M, dtype, kron, stack-for-gather) — the value-critical subset
        (2, jnp.float32, "repeat", False),    # current production M=2 f32
        (2, jnp.bfloat16, "repeat", False),   # current bf16 default
        (1, jnp.float32, "repeat", False),    # margin effect (P^2 <= 128)
        (1, jnp.bfloat16, "repeat", False),
        (1, jnp.bfloat16, "iota", False),     # kron build variant
        (1, jnp.bfloat16, "iota", True),      # + buffered stores
    ]
    for M, dt, kron, stack in cases:
        ts = tl.TileSpec(grid=(128, 128, 128), T=T, M=M, B=B, chunk=32)
        P = ts.P
        dn = "bf16" if dt == jnp.bfloat16 else "f32"
        E = E13[:, :, :P, :P * P]
        if not stack:
            timed(f"deposit M={M} P={P} {dn} {kron}",
                  lambda a, val, ts=ts, kron=kron, dt=dt: deposit_v(
                      a[0], a[1], a[2], val, ts, kron, dt),
                  (lp, vel, value), reps)
        timed(f"gather  M={M} P={P} {dn} {kron} stack={int(stack)}",
              lambda a, e, ts=ts, kron=kron, stack=stack, dt=dt: gather_v(
                  e, a[0], a[1], a[2], ts, kron, stack, dt),
              (lp, vel, E), reps)


if __name__ == "__main__":
    main()
