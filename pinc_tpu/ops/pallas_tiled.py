"""Pallas TPU kernels for the tiled PIC hot loop.

The XLA einsum formulation of tiled deposition/gather (ops/tiled.py)
round-trips the (B, P^2) separable-weight intermediates through HBM, which
caps it ~10x below compute speed-of-light.  These kernels fuse the weight
construction with the contractions entirely in VMEM.

Layout (v3, full-row): each tile's B slots live on the *lane* axis as ONE
(1, B) row; node offsets live on sublanes.  Per tile the kernel builds the
hat-weight matrices with pure elementwise iota arithmetic (no cross-sublane
relayouts) and runs ONE long-K MXU contraction:

* ``deposit``:  out(P, P^2) = W_x(P, B) @ kron(W_y, W_z)(P^2, B)^T —
  contraction over the B lanes, K = B.
* ``gather``:   G(C*P, B) = E_tile(C*P, P^2) @ kron(P^2, B), then a
  sublane reduction against W_x gives the per-particle field — no
  per-particle memory indexing at all.

This replaced an 8-sublane-row blocking (measured 0.363 -> 0.345 ns/slot
deposit, 0.574 -> 0.466 gather at 128^3/B=9216 on v5e): one build + one
dot per tile amortizes fixed per-row costs and lengthens the K stream.
Also measured and rejected: int8 weights (0.445 ns/slot — the round/
convert VPU cost exceeds the MXU push saving), bf16-native weight builds
(0.49 — VPU bf16 elementwise is emulated), multi-accumulator and
concat-K schedulings (no change).

The fused variants cut the remaining XLA glue passes of the step:

* ``deposit_move``: leapfrog drift (x += v), out-of-margin count, alive
  masking and charge weighting all happen inside the deposition kernel —
  the positions stream HBM->VMEM once instead of three times.
* ``gather_kick``: the velocity kick v += qm*E(x) and the kinetic-energy
  sum v.(v+dv) happen inside the gather kernel; the per-particle field
  never goes back to HBM at all.

HBM traffic is exactly the particle state (+ small per-tile outputs), so
both kernels are compute-bound MXU/VPU work.  Cross-checked against
ops/tiled.py in interpret mode (tests/test_pallas_tiled.py).

Reference parity: deposit == puDistr3D1 (src/pusher.c:512-572), gather +
kick == puAcc3D1KE (src/pusher.c:147-214), move == puMove
(src/pusher.c:86-119) — rebuilt as dense separable contractions instead
of per-particle scatter/gather walks.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiled import TileSpec


def _weights_t(row, P: int, M: int):
    """row (1, B) tile-local coords -> (P, B) hat weights, node offsets
    [-M .. T+M] on the sublane axis."""
    b = row.shape[-1]
    nodes = jax.lax.broadcasted_iota(jnp.int32, (P, b), 0)
    nodes = nodes.astype(jnp.float32) - float(M)
    return jnp.maximum(0.0, 1.0 - jnp.abs(row - nodes))


def _kron_iota(y_row, z_row, P: int, M: int, dtype):
    """(1,B) y/z coords -> (P*P, B) kron of hat weights, built purely
    elementwise against sublane iotas — no cross-sublane data movement."""
    b = y_row.shape[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (P * P, b), 0)
    yy = (j // P).astype(jnp.float32) - float(M)
    zz = (j % P).astype(jnp.float32) - float(M)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y_row - yy))
    wz = jnp.maximum(0.0, 1.0 - jnp.abs(z_row - zz))
    return (wy * wz).astype(dtype)


def _tiles_per_step(NT: int, G: int) -> int:
    """Largest power-of-two divisor of NT that is <= G (and a multiple of
    8 when possible, for the (G, B) block sublane rule)."""
    while NT % G:
        G //= 2
    return max(G, 1)


def _row_specs(NT: int, B: int, G: int, n: int):
    pin = pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return [pin] * n


# ---------------------------------------------------------------------------
# Deposition
# ---------------------------------------------------------------------------

def _deposit_kernel(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M,
                    mxu_dtype, G):
    def tile_body(g, _):
        sl = (pl.ds(g, 1), slice(None))
        wx = (_weights_t(x_ref[sl], P, M) * val_ref[sl]).astype(mxu_dtype)
        wyz = _kron_iota(y_ref[sl], z_ref[sl], P, M, mxu_dtype)
        acc = jax.lax.dot_general(
            wx, wyz, (((1,), (1,)), ((), ())),      # contract lanes, K = B
            preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0

    jax.lax.fori_loop(0, G, tile_body, 0)


def deposit(xyz: jax.Array, value: jax.Array, ts: TileSpec,
            interpret: bool = False, mxu_dtype=jnp.float32,
            tiles_per_step: int = 8) -> jax.Array:
    """xyz (3, NT, B) tile-local coordinate planes f32, value (NT, B)
    charge*alive -> padded tile densities (NT, P, P*P) f32.

    Component-plane input keeps the kernel feed transpose-free (an
    (NT, B, 3) layout would materialize three strided copies per call).

    mxu_dtype=bfloat16 halves the MXU operand push traffic; deposit and
    gather then use IDENTICALLY-rounded weight matrices, so gather stays
    the exact adjoint of deposit (the self-force cancellation PIC needs)
    — only an O(2^-8) zero-mean weight dither is introduced."""
    assert ts.n_dims == 3, "pallas deposit is 3D (use ops.tiled for ND)"
    _, NT, B = xyz.shape
    P = ts.P
    G = _tiles_per_step(NT, tiles_per_step)

    out = pl.pallas_call(
        partial(_deposit_kernel, P=P, M=ts.M, mxu_dtype=mxu_dtype, G=G),
        out_shape=jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
        grid=(NT // G,),
        in_specs=_row_specs(NT, B, G, 4),
        out_specs=pl.BlockSpec((G, P, P * P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xyz[0], xyz[1], xyz[2], value)
    return out


def deposit_to_grid(xyz, alive, charge, ts: TileSpec,
                    interpret: bool = False,
                    mxu_dtype=jnp.float32) -> jax.Array:
    from .tiled import fold_to_global
    value = jnp.where(alive, jnp.asarray(charge, jnp.float32), 0.0)
    tiles = deposit(xyz, value, ts, interpret=interpret,
                    mxu_dtype=mxu_dtype)
    return fold_to_global(tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)


# ---------------------------------------------------------------------------
# Fused move + deposition (+ out-of-margin count)
# ---------------------------------------------------------------------------

def _deposit_move_kernel(x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref,
                         alive_ref, out_ref, xo_ref, yo_ref, zo_ref,
                         nout_ref, *, P, M, T, q, mxu_dtype, G):
    lo, hi = -float(M), float(T + M)

    def tile_body(g, bad_acc):
        sl = (pl.ds(g, 1), slice(None))
        alive = alive_ref[sl]
        x = x_ref[sl] + vx_ref[sl]
        y = y_ref[sl] + vy_ref[sl]
        z = z_ref[sl] + vz_ref[sl]
        xo_ref[sl] = x
        yo_ref[sl] = y
        zo_ref[sl] = z
        out = ((x < lo) | (x >= hi) | (y < lo) | (y >= hi)
               | (z < lo) | (z >= hi))
        bad = jnp.where(out, alive, 0.0)
        wx = (_weights_t(x, P, M) * (alive * q)).astype(mxu_dtype)
        wyz = _kron_iota(y, z, P, M, mxu_dtype)
        acc = jax.lax.dot_general(
            wx, wyz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return bad_acc + jnp.sum(bad)

    total = jax.lax.fori_loop(0, G, tile_body, jnp.float32(0))
    nout_ref[...] = jnp.zeros_like(nout_ref) + total


def deposit_move(xyz: jax.Array, vel: jax.Array, alive: jax.Array,
                 charge: float, ts: TileSpec, interpret: bool = False,
                 mxu_dtype=jnp.float32, tiles_per_step: int = 8):
    """Fused leapfrog drift + CIC deposition for one species.

    xyz, vel: (3, NT, B) planes f32; alive: (NT, B) f32 0/1 mask.
    Returns (tiles (NT, P, P*P) charge-weighted, new_xyz (3, NT, B),
    n_out scalar f32 — live particles beyond the wander margin)."""
    assert ts.n_dims == 3
    _, NT, B = xyz.shape
    P = ts.P
    G = _tiles_per_step(NT, tiles_per_step)

    tiles, xo, yo, zo, nout = pl.pallas_call(
        partial(_deposit_move_kernel, P=P, M=ts.M, T=ts.T,
                q=float(charge), mxu_dtype=mxu_dtype, G=G),
        out_shape=(jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
                   jax.ShapeDtypeStruct((NT, B), jnp.float32),
                   jax.ShapeDtypeStruct((NT, B), jnp.float32),
                   jax.ShapeDtypeStruct((NT, B), jnp.float32),
                   jax.ShapeDtypeStruct((NT // G, 1, 128),
                                        jnp.float32)),
        grid=(NT // G,),
        in_specs=_row_specs(NT, B, G, 7),
        out_specs=(pl.BlockSpec((G, P, P * P), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   *_row_specs(NT, B, G, 3),
                   pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(xyz[0], xyz[1], xyz[2], vel[0], vel[1], vel[2], alive)
    new_xyz = jnp.stack([xo, yo, zo])
    return tiles, new_xyz, jnp.sum(nout[:, 0, 0])


# ---------------------------------------------------------------------------
# Gather
# ---------------------------------------------------------------------------

def _gather_kernel(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C,
                   mxu_dtype, G):
    """Per tile:  G_all(C*P, B) = E_all(C*P, P^2) @ wyz(P^2, B) on the MXU
    (all C components stacked along the matmul M-dim), then e_c = sum_x
    wx * G_c — the largest intermediate is the shared (P^2, B) kron."""
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(mxu_dtype)
        sl = (pl.ds(g, 1), slice(None))
        wx = _weights_t(x_ref[sl], P, M)             # (P, B)
        wyz = _kron_iota(y_ref[sl], z_ref[sl], P, M, mxu_dtype)
        G_all = jax.lax.dot_general(
            E_all, wyz, (((1,), (0,)), ((), ())),    # (C*P, B)
            preferred_element_type=jnp.float32)
        for c in range(C):
            Gc = G_all[c * P:(c + 1) * P, :]
            out_ref[c, g, :] = jnp.sum(wx * Gc, axis=0)
        return 0

    jax.lax.fori_loop(0, G, tile_body, 0)


def gather(field_pad: jax.Array, xyz: jax.Array, ts: TileSpec,
           interpret: bool = False, mxu_dtype=jnp.float32,
           tiles_per_step: int = 8) -> jax.Array:
    """field_pad (NT, P, P, P, C), xyz (3, NT, B) coordinate planes ->
    (C, NT, B) component-major field at the particles (matches the
    plane state layout, so neither side of the call transposes)."""
    assert ts.n_dims == 3
    _, NT, B = xyz.shape
    P = ts.P
    C = field_pad.shape[-1]
    G = _tiles_per_step(NT, tiles_per_step)

    # component-major field tiles: (NT, C, P, P^2)
    E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
    out = pl.pallas_call(
        partial(_gather_kernel, P=P, M=ts.M, C=C, mxu_dtype=mxu_dtype, G=G),
        out_shape=jax.ShapeDtypeStruct((C, NT, B), jnp.float32),
        grid=(NT // G,),
        in_specs=[*_row_specs(NT, B, G, 3),
                  pl.BlockSpec((G, C, P, P * P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, G, B), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xyz[0], xyz[1], xyz[2], E)
    return out


# ---------------------------------------------------------------------------
# Mega-fused step: kick + drift + deposit, ALL species in one kernel
# ---------------------------------------------------------------------------

def _pic_step_kernel(q_ref, qm_ref, pos_ref, vel_ref, alive_ref, e_ref,
                     tiles_ref, pos_out_ref, vel_out_ref, ke_ref, nout_ref,
                     *, P, M, T, C, mxu_dtype, G):
    s = pl.program_id(1)
    q = q_ref[0, s]
    qm = qm_ref[0, s]
    lo, hi = -float(M), float(T + M)

    def tile_body(g, acc):
        vdot_acc, bad_acc = acc
        gsl = pl.ds(g, 1)
        alive = alive_ref[0, gsl, :]                     # (1, B)
        x = pos_ref[0, 0, gsl, :]
        y = pos_ref[0, 1, gsl, :]
        z = pos_ref[0, 2, gsl, :]
        # gather E at the pre-drift positions (leapfrog kick with E_n(x_n))
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(mxu_dtype)
        wx = _weights_t(x, P, M)
        wyz = _kron_iota(y, z, P, M, mxu_dtype)
        G_all = jax.lax.dot_general(
            E_all, wyz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (C*P, B)
        vdot = jnp.zeros_like(alive)
        news = []
        for c, pc in enumerate((x, y, z)):
            Gc = G_all[c * P:(c + 1) * P, :]
            Ec = jnp.sum(wx * Gc, axis=0, keepdims=True)  # (1, B)
            dv = (qm * Ec) * alive
            v = vel_ref[0, c, gsl, :]
            vn = v + dv
            vdot = vdot + v * vn
            vel_out_ref[0, c, gsl, :] = vn
            pn = pc + vn                                  # drift with v_{n+1/2}
            pos_out_ref[0, c, gsl, :] = pn
            news.append(pn)
        nx, ny, nz = news
        out = ((nx < lo) | (nx >= hi) | (ny < lo) | (ny >= hi)
               | (nz < lo) | (nz >= hi))
        # deposit at the post-drift positions
        wxn = (_weights_t(nx, P, M) * (alive * q)).astype(mxu_dtype)
        wyzn = _kron_iota(ny, nz, P, M, mxu_dtype)
        dep = jax.lax.dot_general(
            wxn, wyzn, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(s == 0)
        def _():
            tiles_ref[gsl, :, :] = dep[None]

        @pl.when(s != 0)
        def _():
            tiles_ref[gsl, :, :] += dep[None]

        return (vdot_acc + jnp.sum(vdot * alive),
                bad_acc + jnp.sum(jnp.where(out, alive, 0.0)))

    vdot, bad = jax.lax.fori_loop(
        0, G, tile_body, (jnp.float32(0), jnp.float32(0)))
    ke_ref[...] = jnp.zeros_like(ke_ref) + vdot
    nout_ref[...] = jnp.zeros_like(nout_ref) + bad


def pic_step(field_pad: jax.Array, lpos: jax.Array, vel: jax.Array,
             alive: jax.Array, charge, qm_dt, ts: TileSpec,
             interpret: bool = False, mxu_dtype=jnp.float32,
             tiles_per_step: int = 8):
    """One full leapfrog step for ALL species in a single Pallas kernel:
    gather E(x_n) -> kick v -> drift x -> CIC-deposit rho_{n+1}.

    The species loop rides the second grid dimension (s innermost), so the
    per-tile density block stays resident in VMEM and accumulates across
    species, and the E tiles are fetched once per tile block rather than
    once per species.  Versus the deposit_move/gather_kick pair this
    halves the particle-state HBM traffic (x, v stream once per step) and
    removes the (S, 3, NT, B) stack copies entirely.

    field_pad (NT, P, P, P, C); lpos, vel (S, 3, NT, B); alive (S, NT, B)
    f32 0/1; charge (S,) deposit weights; qm_dt (S,) kick factors
    (q/m * dt).  Returns (tiles (NT, P, P*P) summed over species,
    new_lpos, new_vel, vdot (S,) = sum alive*v.(v+dv) per species,
    n_out (S,) live particles beyond the wander margin after the drift).

    Reference parity: one iteration of the src/main.c:197-274 time loop's
    particle work — acc (pusher.c:147-214), puMove (pusher.c:86-119) and
    puDistr3D1 (pusher.c:512-572) — with the reference's separate grid
    sweeps fused into one VMEM-resident pass.
    """
    assert ts.n_dims == 3
    S, D, NT, B = lpos.shape
    P = ts.P
    G = _tiles_per_step(NT, tiles_per_step)
    NI = NT // G

    if field_pad.ndim == 4:
        # already component-major (NT, C, P, P*P) — ops.tiled.pad_tiles_cmajor
        E = field_pad
        C = field_pad.shape[1]
    else:
        C = field_pad.shape[-1]
        E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
    q_arr = jnp.asarray(charge, jnp.float32).reshape(1, S)
    qm_arr = jnp.asarray(qm_dt, jnp.float32).reshape(1, S)
    smem = pl.BlockSpec((1, S), lambda i, s: (0, 0),
                        memory_space=pltpu.SMEM)
    svec = pl.BlockSpec((1, 3, G, B), lambda i, s: (s, 0, i, 0),
                        memory_space=pltpu.VMEM)
    srow = pl.BlockSpec((1, G, B), lambda i, s: (s, i, 0),
                        memory_space=pltpu.VMEM)
    sacc = pl.BlockSpec((1, 1, 1, 128), lambda i, s: (s, i, 0, 0),
                        memory_space=pltpu.VMEM)

    tiles, pos_o, vel_o, ke, nout = pl.pallas_call(
        partial(_pic_step_kernel, P=P, M=ts.M, T=ts.T, C=C,
                mxu_dtype=mxu_dtype, G=G),
        out_shape=(jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
                   jax.ShapeDtypeStruct((S, 3, NT, B), jnp.float32),
                   jax.ShapeDtypeStruct((S, 3, NT, B), jnp.float32),
                   jax.ShapeDtypeStruct((S, NI, 1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((S, NI, 1, 128), jnp.float32)),
        grid=(NI, S),
        in_specs=[smem, smem, svec, svec, srow,
                  pl.BlockSpec((G, C, P, P * P), lambda i, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((G, P, P * P), lambda i, s: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   svec, svec, sacc, sacc),
        interpret=interpret,
    )(q_arr, qm_arr, lpos, vel, alive, E)
    return (tiles, pos_o, vel_o,
            jnp.sum(ke[:, :, 0, 0], axis=1),
            jnp.sum(nout[:, :, 0, 0], axis=1))


# ---------------------------------------------------------------------------
# Fused gather + kick (+ kinetic energy)
# ---------------------------------------------------------------------------

def _gather_kick_kernel(x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref,
                        alive_ref, e_ref, vxo_ref, vyo_ref, vzo_ref,
                        ke_ref, *, P, M, C, qm, mxu_dtype, G):
    def tile_body(g, vdot_acc):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(mxu_dtype)
        sl = (pl.ds(g, 1), slice(None))
        alive = alive_ref[sl]
        wx = _weights_t(x_ref[sl], P, M)
        wyz = _kron_iota(y_ref[sl], z_ref[sl], P, M, mxu_dtype)
        G_all = jax.lax.dot_general(
            E_all, wyz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vdot = jnp.zeros_like(alive)
        for c, (vref, voref) in enumerate(
                ((vx_ref, vxo_ref), (vy_ref, vyo_ref), (vz_ref, vzo_ref))):
            Ec = jnp.sum(wx * G_all[c * P:(c + 1) * P, :], axis=0)
            dv = (qm * Ec)[None] * alive
            v = vref[sl]
            vdot = vdot + v * (v + dv)
            voref[sl] = v + dv
        return vdot_acc + jnp.sum(vdot * alive)

    total = jax.lax.fori_loop(0, G, tile_body, jnp.float32(0))
    ke_ref[...] = jnp.zeros_like(ke_ref) + total


def gather_kick(field_pad: jax.Array, xyz: jax.Array, vel: jax.Array,
                alive: jax.Array, qm: float, ts: TileSpec,
                interpret: bool = False, mxu_dtype=jnp.float32,
                tiles_per_step: int = 8):
    """Fused CIC field gather + velocity kick + kinetic-energy sum for one
    species (the KE variant of the reference's accelerators,
    src/pusher.c:178-214: KE uses v.(v+dv), the half-step-centered
    product).

    field_pad (NT, P, P, P, C); xyz, vel (3, NT, B); alive (NT, B) f32.
    qm: q/m * dt (fold any half-kick factor in here — E enters linearly).
    Returns (new_vel (3, NT, B), vdot_sum scalar = sum alive*v.(v+dv))."""
    assert ts.n_dims == 3
    _, NT, B = xyz.shape
    P = ts.P
    C = field_pad.shape[-1]
    G = _tiles_per_step(NT, tiles_per_step)

    E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
    vxo, vyo, vzo, ke = pl.pallas_call(
        partial(_gather_kick_kernel, P=P, M=ts.M, C=C, qm=float(qm),
                mxu_dtype=mxu_dtype, G=G),
        out_shape=(jax.ShapeDtypeStruct((NT, B), jnp.float32),
                   jax.ShapeDtypeStruct((NT, B), jnp.float32),
                   jax.ShapeDtypeStruct((NT, B), jnp.float32),
                   jax.ShapeDtypeStruct((NT // G, 1, 128),
                                        jnp.float32)),
        grid=(NT // G,),
        in_specs=[*_row_specs(NT, B, G, 7),
                  pl.BlockSpec((G, C, P, P * P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(*_row_specs(NT, B, G, 3),
                   pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(xyz[0], xyz[1], xyz[2], vel[0], vel[1], vel[2], alive, E)
    return jnp.stack([vxo, vyo, vzo]), jnp.sum(ke[:, 0, 0])
