"""Pallas matmul-based row compaction — the fast path for re-bucketing.

Re-bucketing needs two irregular primitives per exchange direction:
*extract* (compact masked rows of every tile's bucket into a small buffer)
and *merge* (append a buffer's rows after each bucket's survivors).  On
this TPU every irregular op (scatter/gather/sort) runs at ~50-100M
elements/s, which made the lax.sort re-bucket cost seconds at 128^3.

Both primitives are *permutations*, and a permutation is a matmul with a
one-hot selection matrix.  With payload fields stacked on the sublane axis
(C = 8 rows) the contraction

    out(C, K) += payload(C, BB) @ onehot(BB, K)

has M = 8 (exactly one sublane tile), N = K (full lanes) and K-dim = BB —
near-perfect MXU shapes.  The one-hot is built on the VPU from the
destination ranks (cumsum of the selection mask, computed densely outside)
and never touches HBM.  One-hot matmuls are exact in any dtype (each
output element is a sum of a single product), so f32 payloads pass through
bit-exact.

Used by ops/tiled.py's exchange re-bucket (rebucket_exchange) when enabled
and by the sort re-bucket replacement; falls back to interpret mode on CPU
for tests.
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


def _chunk(B: int, target: int = 2048) -> int:
    c = min(B, target)
    while B % c:
        c //= 2
    return max(c, 1)


# ---------------------------------------------------------------------------
# extract: out[t, :, k] = payload[t, :, i] where rank[t, i] == k
# ---------------------------------------------------------------------------

def _extract_kernel(rank_ref, pay_ref, out_ref, *, K, CB):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rank = rank_ref[0, 0, :]                           # (CB,) int32
    cols = jax.lax.broadcasted_iota(jnp.int32, (CB, K), 1)
    onehot = (rank[:, None] == cols).astype(jnp.float32)   # (CB, K)
    pay = pay_ref[0, :, :]                             # (C8, CB)
    out_ref[0, :, :] += jax.lax.dot_general(
        pay, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def extract(rank: jax.Array, payload: jax.Array, K: int,
            interpret: bool = False) -> jax.Array:
    """rank (NT, B) int32 destination slots (negative = keep), payload
    (NT, C8, B) f32 -> (NT, C8, K) compacted rows."""
    NT, C8, B = payload.shape
    CB = _chunk(B)
    grid = (NT, B // CB)
    out = pl.pallas_call(
        partial(_extract_kernel, K=K, CB=CB),
        out_shape=jax.ShapeDtypeStruct((NT, C8, K), jnp.float32),
        grid=grid,
        in_specs=[
            # rank passed (NT, 1, B): the (1, CB) trailing block dims then
            # satisfy Mosaic's last-two-dims rule (1 == array dim)
            pl.BlockSpec((1, 1, CB), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C8, CB), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C8, K), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rank.reshape(NT, 1, B), payload)
    return out


# ---------------------------------------------------------------------------
# merge: out[t, :, b] = incoming[t, :, k] where slot[t, k] == b
# (scatter the K buffer rows onto their target slots; caller blends with
# the kept payload)
# ---------------------------------------------------------------------------

def _merge_kernel(slot_ref, buf_ref, out_ref, *, K, CB):
    slot = slot_ref[0, 0, :]                           # (K,)
    j = pl.program_id(1)
    base = j * CB
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, CB), 1) + base
    onehot = (slot[:, None] == cols).astype(jnp.float32)   # (K, CB)
    buf = buf_ref[0, :, :]                             # (C8, K)
    out_ref[0, :, :] = jax.lax.dot_general(
        buf, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def merge(slot: jax.Array, buf: jax.Array, B: int,
          interpret: bool = False) -> jax.Array:
    """slot (NT, K) int32 target slots (negative = dropped), buf
    (NT, C8, K) f32 -> (NT, C8, B) with buffer rows at their slots,
    zero elsewhere."""
    NT, C8, K = buf.shape
    CB = _chunk(B)
    grid = (NT, B // CB)
    out = pl.pallas_call(
        partial(_merge_kernel, K=K, CB=CB),
        out_shape=jax.ShapeDtypeStruct((NT, C8, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C8, K), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C8, CB), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(slot.reshape(NT, 1, K), buf)
    return out
