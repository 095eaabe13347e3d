"""Pallas TPU kernels for the tiled PIC hot loop.

The XLA einsum formulation of tiled deposition/gather (ops/tiled.py)
round-trips the (B, P^2) separable-weight intermediates through HBM, which
caps it ~10x below compute speed-of-light.  These kernels fuse the weight
construction with the contractions entirely in VMEM:

* ``deposit`` — each grid step loads a block of one tile's particles,
  builds the three hat-weight matrices on the VPU, forms w_y (x) w_z in
  VMEM and accumulates ``out += wx^T @ wyz`` on the MXU into the tile's
  (P, P^2) output block (revisited across the particle-grid dimension).
* ``gather`` — same grid: three chained contractions of the (P, P, P, C)
  field tile against the hat weights produce the per-particle field with
  no per-particle memory indexing at all.

HBM traffic is exactly the particle coordinates (+ output), so both
kernels are compute-bound MXU work.

TPU block-shape rules (last two block dims divisible by (8, 128) or equal
to the array dims) shape the layout: per-tile coordinate rows are reshaped
to (NT * B/BBC, BBC) and each kernel step takes an (8, BBC) block — eight
row-chunks of the *same* tile (PB = 8*BBC particles per step).

Cross-checked against ops/tiled.py and ops/cic.py in interpret mode
(tests/test_pallas_tiled.py).
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


def _layout(B: int, target_pb: int = 8192) -> Tuple[int, int]:
    """Split a tile's B slots into (rows of BBC columns); one kernel step
    processes 8 rows.  Returns (BBC, grid_j) with B == grid_j * 8 * BBC."""
    if B % 8 != 0:
        raise ValueError(f"bucket capacity {B} must be a multiple of 8")
    bbc = B // 8
    grid_j = 1
    # prefer ~target_pb particles per step when B is large
    while bbc % 2 == 0 and bbc > 128 and 8 * bbc > target_pb:
        bbc //= 2
        grid_j *= 2
    return bbc, grid_j


def _weights(coords, P: int, M: int):
    """(PB,) tile-local coords -> (PB, P) CIC hat weights over node offsets
    [-M .. T+M] (2D iota: TPU requires >=2D)."""
    nodes = jax.lax.broadcasted_iota(jnp.float32, (coords.shape[0], P),
                                     1) - float(M)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, None] - nodes))


# ---------------------------------------------------------------------------
# Deposition
# ---------------------------------------------------------------------------

def _deposit_kernel(x_ref, y_ref, z_ref, val_ref, out_ref, *, P, M):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    pb = x_ref.shape[0] * x_ref.shape[1]
    x = x_ref[...].reshape(pb)
    y = y_ref[...].reshape(pb)
    z = z_ref[...].reshape(pb)
    val = val_ref[...].reshape(pb)
    wx = _weights(x, P, M) * val[:, None]
    wy = _weights(y, P, M)
    wz = _weights(z, P, M)
    wyz = (wy[:, :, None] * wz[:, None, :]).reshape(pb, P * P)
    out_ref[0, :, :] += jax.lax.dot_general(
        wx, wyz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def deposit(lpos: jax.Array, value: jax.Array, ts: TileSpec,
            interpret: bool = False) -> jax.Array:
    """lpos (NT, B, 3) tile-local f32, value (NT, B) charge*alive ->
    padded tile densities (NT, P, P*P) f32."""
    assert ts.n_dims == 3, "pallas deposit is 3D (use ops.tiled for ND)"
    NT, B, _ = lpos.shape
    P = ts.P
    bbc, grid_j = _layout(B)
    rows_per_tile = B // bbc

    def rs(a):
        return a.reshape(NT * rows_per_tile, bbc)

    pin = pl.BlockSpec((8, bbc),
                       lambda i, j: (i * (rows_per_tile // 8) + j, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_deposit_kernel, P=P, M=ts.M),
        out_shape=jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
        grid=(NT, grid_j),
        in_specs=[pin, pin, pin, pin],
        out_specs=pl.BlockSpec((1, P, P * P), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rs(lpos[..., 0]), rs(lpos[..., 1]), rs(lpos[..., 2]), rs(value))
    return out


def deposit_to_grid(lpos, alive, charge, ts: TileSpec,
                    interpret: bool = False) -> jax.Array:
    from .tiled import fold_to_global
    value = jnp.where(alive, jnp.asarray(charge, jnp.float32), 0.0)
    tiles = deposit(lpos, value, ts, interpret=interpret)
    return fold_to_global(tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)


# ---------------------------------------------------------------------------
# Gather
# ---------------------------------------------------------------------------

def _gather_kernel(x_ref, y_ref, z_ref, e_ref, out_ref, *, P, M, C):
    pb = x_ref.shape[0] * x_ref.shape[1]
    wx = _weights(x_ref[...].reshape(pb), P, M)
    wy = _weights(y_ref[...].reshape(pb), P, M)
    wz = _weights(z_ref[...].reshape(pb), P, M)
    E = e_ref[0, :, :]                           # (P, P*P*C)
    t1 = jax.lax.dot_general(                    # (PB, P*P*C)
        wx, E, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    t1 = t1.reshape(pb, P, P * C)
    t2 = jnp.sum(wy[:, :, None] * t1, axis=1)    # (PB, P*C)
    t2 = t2.reshape(pb, P, C)
    t3 = jnp.sum(wz[:, :, None] * t2, axis=1)    # (PB, C)
    out_ref[0, :, :] = t3.T                      # (C, PB)


def gather(field_pad: jax.Array, lpos: jax.Array, ts: TileSpec,
           interpret: bool = False) -> jax.Array:
    """field_pad (NT, P, P, P, C), lpos (NT, B, 3) -> (NT, B, C)."""
    assert ts.n_dims == 3
    NT, B, _ = lpos.shape
    P = ts.P
    C = field_pad.shape[-1]
    bbc, grid_j = _layout(B)
    rows_per_tile = B // bbc
    pb = 8 * bbc

    def rs(a):
        return a.reshape(NT * rows_per_tile, bbc)

    pin = pl.BlockSpec((8, bbc),
                       lambda i, j: (i * (rows_per_tile // 8) + j, 0),
                       memory_space=pltpu.VMEM)
    E = field_pad.reshape(NT, P, P * P * C)
    out = pl.pallas_call(
        partial(_gather_kernel, P=P, M=ts.M, C=C),
        out_shape=jax.ShapeDtypeStruct((NT, C, B), jnp.float32),
        grid=(NT, grid_j),
        in_specs=[pin, pin, pin,
                  pl.BlockSpec((1, P, P * P * C), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C, pb), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rs(lpos[..., 0]), rs(lpos[..., 1]), rs(lpos[..., 2]), E)
    return jnp.swapaxes(out, 1, 2)               # (NT, B, C)
