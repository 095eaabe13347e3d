"""A/B kernel experiments for the tiled PIC Pallas kernels (TPU only).

Variants under test, at 128^3 / one 33.5M-particle species slab:
  gather-repeat : current _kron_rows (sublane repeat + concat)
  gather-iota   : direct iota-based wyz build (pure elementwise, no
                  sublane data movement)
  gather-stack  : iota build + buffered (C,8,bbc) store per tile
  deposit-repeat/deposit-iota : same question for deposition

Usage: python script/kernel_variants_tpu.py [M] [reps]
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

from pinc_tpu.ops import pallas_tiled as ptl  # noqa: E402
from pinc_tpu.ops import tiled as tl  # noqa: E402
from pinc_tpu.ops.pallas_tiled import _weights_t, _kron_rows  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kron_iota(y_row, z_row, P, M, dtype):
    """(1,BBC)x2 -> (P*P, BBC) kron, built elementwise from iota rows."""
    bbc = y_row.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (P * P, bbc), 0)
    yy = (j // P).astype(jnp.float32) - float(M)
    zz = (j % P).astype(jnp.float32) - float(M)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_row - yy))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(z_row - zz))
    return (wy * wz).astype(dtype)


# --- deposit variants -------------------------------------------------------

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


def deposit_v(lpos, value, ts, kron, dt=jnp.float32, G=8):
    NT, B, _ = lpos.shape
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
    )(rs(lpos[..., 0]), rs(lpos[..., 1]), rs(lpos[..., 2]), rs(value))


# --- gather variants --------------------------------------------------------

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
                    out_ref[g, c, r, :] = jnp.sum(
                        wx * G_all[c * P:(c + 1) * P, :], axis=0)
        if stack:
            out_ref[g, :, :, :] = jnp.stack(rows, axis=1)   # (C, 8, bbc)
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def gather_v(field_pad, lpos, ts, kron, stack, dt=jnp.float32, G=8):
    NT, B, _ = lpos.shape
    P = ts.P
    C = field_pad.shape[-1]
    bbc = B // 8
    rs = lambda a: a.reshape(NT * 8, bbc)
    pin = pl.BlockSpec((8 * G, bbc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
    out = pl.pallas_call(
        partial(_gat_kernel, P=P, M=ts.M, C=C, dt=dt, G=G, kron=kron,
                stack=stack),
        out_shape=jax.ShapeDtypeStruct((NT, C, 8, bbc), jnp.float32),
        grid=(NT // G,),
        in_specs=[pin, pin, pin,
                  pl.BlockSpec((G, C, P, P * P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, C, 8, bbc), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rs(lpos[..., 0]), rs(lpos[..., 1]), rs(lpos[..., 2]), E)
    return out


def timed_chain(f, lpos, vel, reps):
    def body(carry, _):
        lp, acc = carry
        out = f(lp)
        return (lp + vel, acc + jnp.sum(out)), None

    @jax.jit
    def run(lp):
        (lp, acc), _ = jax.lax.scan(body, (lp, jnp.zeros(())), None,
                                    length=reps)
        return acc

    acc = run(lpos)
    jax.block_until_ready(acc)
    t0 = time.monotonic()
    acc = run(lpos)
    jax.block_until_ready(acc)
    return (time.monotonic() - t0) / reps, float(acc)


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    log(f"device: {jax.devices()[0]}  M={M}")
    rng = np.random.default_rng(0)
    T, B, fill = 8, 12288, 8192
    NT = (128 // T) ** 3
    ts = tl.TileSpec(grid=(128, 128, 128), T=T, M=M, B=B, chunk=32)
    P = ts.P
    lpos = jnp.asarray(rng.uniform(0, T, size=(NT, B, 3)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 0.004, size=(NT, B, 3))
                      .astype(np.float32))
    alive = np.zeros((NT, B), np.float32)
    alive[:, :fill] = 1.0
    value = jnp.asarray(alive)
    E = jnp.asarray(rng.normal(size=(NT, P, P, P, 3)).astype(np.float32))

    for dt in (jnp.float32, jnp.bfloat16):
        dn = "bf16" if dt == jnp.bfloat16 else "f32"
        for kron in ("repeat", "iota"):
            s, a = timed_chain(lambda lp: deposit_v(lp, value, ts, kron, dt),
                               lpos, vel, reps)
            log(f"deposit {kron:6s} {dn}: {s*1e3:7.1f} ms  sum={a:.4e}")
        for kron, stack in (("repeat", False), ("iota", False),
                            ("iota", True)):
            s, a = timed_chain(
                lambda lp: gather_v(E, lp, ts, kron, stack, dt),
                lpos, vel, reps)
            log(f"gather  {kron:6s} stack={int(stack)} {dn}: {s*1e3:7.1f} ms"
                f"  sum={a:.4e}")


if __name__ == "__main__":
    main()
