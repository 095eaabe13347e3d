"""Fused ±1-tile exchange re-bucketing kernels (v2 of the sort-free path).

The v1 exchange (ops/pallas_rebucket.py + ops/tiled.rebucket_exchange)
issues 6 directional transfers, each re-reading and re-writing the whole
(NT, 8, B) payload from XLA — ~100 GB of HBM traffic per species at
production size (measured 847 ms at 128^3; the lax.sort re-bucket costs
2.7 s).  This version restructures the pass so each dimension costs two
lean Pallas kernels over component *planes*:

* ``extract`` — one kernel reads the six (NT, B) coordinate/velocity
  planes and a precomputed destination-rank encoding, and emits only the
  compacted leaver buffers (NT, 8, 2K) plus the updated alive plane
  (NT, B).  Both directions share one selection matmul: minus-going
  leavers get buffer slots [0, K), plus-going [K, 2K).
* ``merge`` — after a host-level roll of the buffers to the neighbor
  tiles (±1 along the dimension, periodic), one kernel blends the
  incoming rows into the free slots: the slot one-hot is built from the
  free-slot ranks (lanes) against the incoming arrival ranks (sublanes,
  pure iota arithmetic — no relayouts), so placement is a single
  (8, 2K) x (2K, CB) MXU contraction per chunk.

Selection/placement matmuls are exact in f32 (each output element is a
sum of exactly one product).  Rank encodings (per-tile cumsums) are dense
XLA ops over the small planes.  Overflow (more than K leavers through one
face, or more arrivals than free slots) drops particles; the driver
counts drops by alive-count conservation and warns — the reference
corrupts memory instead (src/pusher.c:776,913).

Reference parity: this implements the communication step of
puExtractEmigrants3D/puMigrate (src/pusher.c:782-1035) for the tiled
layout — per-dimension neighbor transfer with frame shift, fixed-capacity
buffers, append-at-free-slots.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunk(B: int, target: int = 2048) -> int:
    c = min(B, target)
    while B % c:
        c //= 2
    return max(c, 1)


# Default-precision f32 dots run ONE bf16 MXU pass on v5e: inputs are
# bf16-ROUNDED before multiplying.  That is exact for 0/1 operands (the
# one-hot/triangular scan matrices, and per-128-block counts <= 256), but
# silently corrupts any dot whose operands carry real payloads (particle
# coordinates) or integer counts > 256 (the cross-sublane carry totals:
# 301 -> 300 made two lanes share a free rank and DUPLICATED an arrival —
# bisected 2026-08-18 from a negative drop count).
#
# The payload selection/placement dots use a MANUAL bf16x3 split (see
# _select_dot): Mosaic lowers only DEFAULT (1 bf16 pass) and HIGHEST
# (6 passes, whose staging pushed the extract kernel past the scoped-
# VMEM limit), so the three passes are issued explicitly.  The tiny
# cross-sublane carry matmul uses HIGHEST outright.
_EXACT_SMALL = jax.lax.Precision.HIGHEST


def _select_dot(pay, onehot, dims):
    """Bit-exact f32 payload selection matmul against a 0/1 one-hot.

    Each output element is ONE payload value (times a 0/1 entry), so a
    3-way mantissa split — hi/mid/lo bf16-valued f32 chunks covering all
    24 f32 mantissa bits, each exact under the single-pass bf16 MXU
    default — reconstructs the payload bit-exactly: the residual
    subtractions are exact (Sterbenz), and hi + mid + lo re-sums without
    rounding (non-overlapping mantissa segments).

    Caveat: under interpret=True ON A TPU BACKEND the XLA algebraic
    simplifier re-fuses dot(hi,c)+dot(mid,c)+dot(lo,c) back into one
    default-precision dot and the split is lost — interpret mode is only
    exact on CPU (where the tests run).  The compiled Mosaic path never
    goes through the XLA simplifier, so the three passes survive there;
    validated on hardware by script/validate_tpu.py's velocity-multiset
    check."""
    hi = pay.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = pay - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r1 - mid
    out = None
    for part in (hi, mid, lo):
        d = jax.lax.dot_general(part, onehot, dims,
                                preferred_element_type=jnp.float32)
        out = d if out is None else out + d
    return out


# ---------------------------------------------------------------------------
# rank builds: two-level scan (within-chunk triangular matmul + chunk carry)
# ---------------------------------------------------------------------------

_TRI_C = 128
_TRI_U_NP = None


def _tri_u():
    # cache the numpy constant only — a cached jnp array created under a
    # trace (e.g. first call inside shard_map) would leak a tracer
    global _TRI_U_NP
    if _TRI_U_NP is None:
        import numpy as np
        _TRI_U_NP = np.triu(np.ones((_TRI_C, _TRI_C), np.float32))
    return jnp.asarray(_TRI_U_NP)


def _chunked_cumsum(m: jax.Array) -> jax.Array:
    """Inclusive cumsum along axis 1 of (NT, B) f32, exact for counts.

    A plain lax.cumsum at this size costs ~14 shifted-add passes over the
    whole array in HBM (~5 ms per scan at 4096x9216 on v5e); this runs the
    within-chunk prefix as one (NT*NC, 128) @ U128 MXU matmul and only the
    (NT, NC) chunk totals through cumsum (measured 10.2 -> 7.4 ms for the
    two-scan rank build)."""
    NT, B = m.shape
    if B % _TRI_C:
        return jnp.cumsum(m, axis=1)
    NC = B // _TRI_C
    incl = (m.reshape(NT * NC, _TRI_C) @ _tri_u()).reshape(NT, NC, _TRI_C)
    tot = incl[:, :, -1]
    base = jnp.cumsum(tot, axis=1) - tot
    return (incl + base[:, :, None]).reshape(NT, B)


# ---------------------------------------------------------------------------
# extract: compacted leaver buffers + killed alive plane.
#
# v3 (fused ranks): the kernel views each tile row as an (8, B/8) block
# and computes the leaver prefix-sums IN KERNEL — lane-blocked inclusive
# scans as (8, 128) @ U128 triangular matmuls with a running (8, 1)
# carry, then a (8, 8) strict-triangular matmul for the cross-sublane
# carry.  This removes the two XLA chunked-cumsum rank builds and the
# (NT, B) int32 rank array round-trip per dimension.
# ---------------------------------------------------------------------------

def _tri_incl(b, dtype=jnp.float32):
    """(b, b) upper-triangular ones (inclusive scan when right-applied)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    return (i <= j).astype(dtype)


def _scan_lanes_rows(m):
    """(R, L) f32 0/1 -> per-ROW inclusive prefix along lanes (rows are
    independent — no cross-sublane carry).  Exact for counts."""
    L = m.shape[-1]
    nb = L // 128
    rem = L - nb * 128
    out_blocks = []
    running = jnp.zeros((m.shape[0], 1), jnp.float32)
    u128 = _tri_incl(128)
    for b in range(nb):
        blk = m[:, b * 128:(b + 1) * 128]
        c = jax.lax.dot_general(blk, u128, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_blocks.append(c + running)
        running = running + c[:, 127:128]
    if rem:
        blk = m[:, nb * 128:]
        c = jax.lax.dot_general(blk, _tri_incl(rem),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_blocks.append(c + running)
        running = running + c[:, rem - 1:rem]
    scanned = (out_blocks[0] if len(out_blocks) == 1
               else jnp.concatenate(out_blocks, axis=1))
    return scanned, running


def _scan_lanes_8(m):
    """(8, L) f32 0/1 -> inclusive prefix in (sublane-major, lane) order.
    Exact for counts (f32 integers)."""
    scanned, running = _scan_lanes_rows(m)
    # cross-sublane exclusive carry of the row totals
    i = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
    strict = (j < i).astype(jnp.float32)
    base = jax.lax.dot_general(strict, running, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_EXACT_SMALL)
    return scanned + base


def _extract_fused_kernel(coord_ref, alive_ref, *plane_refs_out, K, T, L):
    *plane_refs, buf_ref, alive_out_ref = plane_refs_out
    K2 = 2 * K
    coord = coord_ref[0]                               # (8, L)
    alive = alive_ref[0]
    al = alive > 0.5
    lm = al & (coord < 0.0)
    lp = al & (coord >= float(T))
    rm = _scan_lanes_8(lm.astype(jnp.float32)) - 1.0
    rp = _scan_lanes_8(lp.astype(jnp.float32)) - 1.0
    # buffer column per slot: minus-goers [0, K), plus-goers [K, 2K),
    # overflow -> 2K (matches no column: killed but dropped), stay -> -1
    rank = jnp.where(lm & (rm < K), rm,
                     jnp.where(lp & (rp < K), float(K) + rp, -1.0))
    kill_only = (lm & (rm >= K)) | (lp & (rp >= K))
    rank = jnp.where(kill_only, float(K2), rank)
    leave = rank >= 0.0
    alive_out_ref[0] = jnp.where(leave, 0.0, alive)

    kidx = jax.lax.broadcasted_iota(jnp.int32, (K2, L), 0).astype(
        jnp.float32)
    acc = jnp.zeros((8, K2), jnp.float32)
    ones = jnp.ones((1, L), jnp.float32)
    zeros = jnp.zeros((1, L), jnp.float32)
    for s in range(8):
        onehot_t = (kidx == rank[s:s + 1, :]).astype(jnp.float32)
        pay = jnp.concatenate(
            [r[0][s:s + 1, :] for r in plane_refs] + [ones, zeros],
            axis=0)                                    # (8, L)
        acc = acc + _select_dot(
            pay, onehot_t, (((1,), (1,)), ((), ())))
    buf_ref[0] = acc


def extract_fused(coord: jax.Array, alive: jax.Array,
                  planes: Tuple[jax.Array, ...], K: int, T: int,
                  interpret: bool = False):
    """coord/alive/planes (NT, B) f32 with B % 8 == 0.  Computes leaver
    ranks in kernel and returns (bufs (NT, 8, 2K), alive_killed (NT, B))."""
    NT, B = alive.shape
    L = B // 8
    row = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    r3 = lambda a: a.reshape(NT, 8, L)
    bufs, alive2 = pl.pallas_call(
        partial(_extract_fused_kernel, K=K, T=T, L=L),
        out_shape=(jax.ShapeDtypeStruct((NT, 8, 2 * K), jnp.float32),
                   jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)),
        grid=(NT,),
        in_specs=[row, row] + [row] * len(planes),
        out_specs=(pl.BlockSpec((1, 8, 2 * K), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM), row),
        interpret=interpret,
    )(r3(coord), r3(alive), *[r3(p) for p in planes])
    return bufs, alive2.reshape(NT, B)


# ---------------------------------------------------------------------------
# v4: per-ROW exchange.  Each sublane row s of tile t exchanges with row
# s of tile t+-1, with its own compact buffer block and free-slot ranks.
# Rank scans lose the cross-sublane carry, and — the actual win — the
# one-hot selection matrices shrink from (2K, L) to (2Ks, L) per row on
# BOTH the extract and the merge (the (2K, L) VPU iota-compare BUILDS,
# not the MXU dots, dominate the v3 exchange: ~8.9M elements per tile
# per extract at K=256).  Ks is the per-row face cap; overflow drops are
# counted by alive-sum conservation outside, as before.
# ---------------------------------------------------------------------------

def _extract_rows_kernel(coord_ref, alive_ref, *plane_refs_out, Ks, T, L):
    *plane_refs, buf_ref, alive_out_ref = plane_refs_out
    K2 = 2 * Ks
    coord = coord_ref[0]                               # (8, L)
    alive = alive_ref[0]
    al = alive > 0.5
    lm = al & (coord < 0.0)
    lp = al & (coord >= float(T))
    rm = _scan_lanes_rows(lm.astype(jnp.float32))[0] - 1.0
    rp = _scan_lanes_rows(lp.astype(jnp.float32))[0] - 1.0
    rank = jnp.where(lm & (rm < Ks), rm,
                     jnp.where(lp & (rp < Ks), float(Ks) + rp, -1.0))
    kill_only = (lm & (rm >= Ks)) | (lp & (rp >= Ks))
    rank = jnp.where(kill_only, float(K2), rank)       # matches no column
    leave = rank >= 0.0
    alive_out_ref[0] = jnp.where(leave, 0.0, alive)

    kidx = jax.lax.broadcasted_iota(jnp.int32, (K2, L), 0).astype(
        jnp.float32)
    ones = jnp.ones((1, L), jnp.float32)
    zeros = jnp.zeros((1, L), jnp.float32)
    for s in range(8):
        onehot_t = (kidx == rank[s:s + 1, :]).astype(jnp.float32)
        pay = jnp.concatenate(
            [r[0][s:s + 1, :] for r in plane_refs] + [ones, zeros],
            axis=0)                                    # (8, L)
        buf_ref[0, :, s * K2:(s + 1) * K2] = _select_dot(
            pay, onehot_t, (((1,), (1,)), ((), ())))        # (8, 2Ks)


def extract_rows(coord: jax.Array, alive: jax.Array,
                 planes: Tuple[jax.Array, ...], Ks: int, T: int,
                 interpret: bool = False):
    """Per-row extract: returns (bufs (NT, 8, 8*2Ks) — row s's compact
    block at columns [s*2Ks, (s+1)*2Ks) — and alive_killed (NT, B))."""
    NT, B = alive.shape
    L = B // 8
    row = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    r3 = lambda a: a.reshape(NT, 8, L)
    bufs, alive2 = pl.pallas_call(
        partial(_extract_rows_kernel, Ks=Ks, T=T, L=L),
        out_shape=(jax.ShapeDtypeStruct((NT, 8, 8 * 2 * Ks), jnp.float32),
                   jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)),
        grid=(NT,),
        in_specs=[row, row] + [row] * len(planes),
        out_specs=(pl.BlockSpec((1, 8, 8 * 2 * Ks), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM), row),
        interpret=interpret,
    )(r3(coord), r3(alive), *[r3(p) for p in planes])
    return bufs, alive2.reshape(NT, B)


def _merge_rows_kernel(alive_ref, inc_ref, *plane_refs_out, Ks, L):
    n_pl = (len(plane_refs_out) - 1) // 2
    plane_refs = plane_refs_out[:n_pl]
    out_refs = plane_refs_out[n_pl:2 * n_pl]
    alive_out_ref = plane_refs_out[-1]
    K2 = 2 * Ks

    alive = alive_ref[0]                                # (8, L)
    free = alive <= 0.5
    fr_incl = _scan_lanes_rows(free.astype(jnp.float32))[0]
    frank = jnp.where(free, fr_incl - 1.0, -1.0)        # per-row ranks

    # passthrough first; hit rows are overwritten below
    for c in range(n_pl):
        out_refs[c][0] = plane_refs[c][0]
    alive_out_ref[0] = alive

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (K2, 1), 0).astype(
        jnp.float32)
    for s in range(8):
        inc_s = inc_ref[0, :, s * K2:(s + 1) * K2]      # (8, 2Ks)
        n_m = jnp.sum(inc_s[6, :Ks])
        n_p = jnp.sum(inc_s[6, Ks:])
        n_arr = n_m + n_p
        vrank = jnp.where(iota_s < Ks, iota_s, iota_s - float(Ks) + n_m)
        valid = (((iota_s < Ks) & (iota_s < n_m))
                 | ((iota_s >= Ks) & (iota_s - float(Ks) < n_p)))
        frank_s = frank[s:s + 1, :]                     # (1, L)
        has = jnp.sum(jnp.where((frank_s >= 0.0) & (frank_s < n_arr),
                                1.0, 0.0)) > 0.0

        @pl.when(has)
        def _(s=s, inc_s=inc_s, vrank=vrank, valid=valid, frank_s=frank_s):
            onehot = ((vrank == frank_s) & valid).astype(jnp.float32)
            placed = _select_dot(
            inc_s, onehot, (((1,), (0,)), ((), ())))     # (8, L)
            hit = placed[6:7, :] > 0.5
            for c in range(n_pl):
                out_refs[c][0, s:s + 1, :] = jnp.where(
                    hit, placed[c:c + 1, :], plane_refs[c][0][s:s + 1, :])
            alive_out_ref[0, s:s + 1, :] = jnp.where(
                hit, 1.0, alive[s:s + 1, :])


def merge_rows(alive: jax.Array, inc: jax.Array,
               planes: Tuple[jax.Array, ...], Ks: int,
               interpret: bool = False):
    """Per-row merge: inc (NT, 8, 8*2Ks) rolled-in buffers (row-blocked
    columns); arrivals land in free slots of their own row."""
    NT, B = alive.shape
    L = B // 8
    row = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    r3 = lambda a: a.reshape(NT, 8, L)
    n_pl = len(planes)
    outs = pl.pallas_call(
        partial(_merge_rows_kernel, Ks=Ks, L=L),
        out_shape=tuple(jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)
                        for _ in range(n_pl + 1)),
        grid=(NT,),
        in_specs=[row,
                  pl.BlockSpec((1, 8, 8 * 2 * Ks), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [row] * n_pl,
        out_specs=tuple([row] * (n_pl + 1)),
        interpret=interpret,
    )(r3(alive), inc, *[r3(p) for p in planes])
    new_planes = tuple(o.reshape(NT, B) for o in outs[:n_pl])
    return new_planes, outs[n_pl].reshape(NT, B)


def default_row_cap(K: int, B: int) -> int:
    """Per-row face cap: K/4 (2x head room over the even K/8 share),
    rounded to the lane quantum."""
    q = 64 if B >= 4096 else 8
    return max(q, -(-K // 4 // q) * q)


# ---------------------------------------------------------------------------
# extract (v2, rank array passed in) — kept for B % 8 != 0 layouts
# ---------------------------------------------------------------------------

def _extract_kernel(rank_ref, alive_ref, *plane_refs_out, K2, CB):
    *plane_refs, buf_ref, alive_out_ref = plane_refs_out
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        buf_ref[...] = jnp.zeros_like(buf_ref)

    rank = rank_ref[0, 0, :]                            # (CB,) int32, -1=stay
    alive = alive_ref[0, 0, :]                          # (CB,) f32
    leave = rank >= 0
    alive_out_ref[0, 0, :] = jnp.where(leave, 0.0, alive)

    # payload rows: 6 planes + the alive flag (always 1 for extracted rows)
    rows = [r[0, 0, :] for r in plane_refs]
    rows.append(jnp.ones_like(alive))
    rows.append(jnp.zeros_like(alive))
    pay = jnp.stack(rows, axis=0)                       # (8, CB)

    # one-hot built TRANSPOSED — slot ranks stay on the lane axis against
    # a sublane iota (building (CB, K2) instead relayouts the CB-lane rank
    # vector onto sublanes, a full transpose per chunk; measured 33 -> 9 ms
    # per extract pass at 4096x9216).  The dot contracts the lane axes of
    # both operands (the same A@B^T form the deposit kernel uses).
    kidx = jax.lax.broadcasted_iota(jnp.int32, (K2, CB), 0)
    onehot_t = (kidx == rank[None, :]).astype(jnp.float32)   # (K2, CB)
    buf_ref[0, :, :] += _select_dot(
            pay, onehot_t, (((1,), (1,)), ((), ())))


def extract(rank: jax.Array, alive: jax.Array, planes: Tuple[jax.Array, ...],
            K2: int, interpret: bool = False):
    """rank (NT, B) int32 buffer-slot encoding (-1 = stays), alive (NT, B)
    f32, planes: six (NT, B) f32 component planes.  Returns
    (bufs (NT, 8, K2), alive_killed (NT, B))."""
    NT, B = rank.shape
    CB = _chunk(B)
    grid = (NT, B // CB)
    row = pl.BlockSpec((1, 1, CB), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    bufs, alive2 = pl.pallas_call(
        partial(_extract_kernel, K2=K2, CB=CB),
        out_shape=(jax.ShapeDtypeStruct((NT, 8, K2), jnp.float32),
                   jax.ShapeDtypeStruct((NT, 1, B), jnp.float32)),
        grid=grid,
        in_specs=[row, row] + [row] * len(planes),
        out_specs=(pl.BlockSpec((1, 8, K2), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   row),
        interpret=interpret,
    )(rank.reshape(NT, 1, B), alive.reshape(NT, 1, B),
      *[p.reshape(NT, 1, B) for p in planes])
    return bufs, alive2.reshape(NT, B)


# ---------------------------------------------------------------------------
# merge: place incoming buffer rows at free slots
#
# v3 (fused franks): free-slot ranks computed in kernel with the same
# (8, B/8) blocked scan as extract_fused; arrivals fill the LOWEST free
# ranks, so sublane rows whose smallest free rank exceeds the arrival
# count skip their placement matmul (the passthrough write is the HBM
# floor).
# ---------------------------------------------------------------------------

def _merge_fused_kernel(alive_ref, inc_ref, *plane_refs_out, K, L):
    n_pl = (len(plane_refs_out) - 1) // 2
    plane_refs = plane_refs_out[:n_pl]
    out_refs = plane_refs_out[n_pl:2 * n_pl]
    alive_out_ref = plane_refs_out[-1]
    K2 = 2 * K

    alive = alive_ref[0]                                # (8, L)
    free = alive <= 0.5
    fr_incl = _scan_lanes_8(free.astype(jnp.float32))
    frank = jnp.where(free, fr_incl - 1.0, -1.0)        # (8, L)

    inc = inc_ref[0]                                    # (8, 2K)
    n_m = jnp.sum(inc[6, :K])
    n_p = jnp.sum(inc[6, K:])
    n_arr = n_m + n_p
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (K2, 1), 0).astype(
        jnp.float32)
    vrank = jnp.where(iota_s < K, iota_s, iota_s - float(K) + n_m)
    valid = (((iota_s < K) & (iota_s < n_m))
             | ((iota_s >= K) & (iota_s - float(K) < n_p)))

    # passthrough first; hit rows are overwritten below
    for c in range(n_pl):
        out_refs[c][0] = plane_refs[c][0]
    alive_out_ref[0] = alive

    for s in range(8):
        frank_s = frank[s:s + 1, :]                     # (1, L)
        has = jnp.sum(jnp.where((frank_s >= 0.0) & (frank_s < n_arr),
                                1.0, 0.0)) > 0.0

        @pl.when(has)
        def _(s=s, frank_s=frank_s):
            onehot = ((vrank == frank_s) & valid).astype(jnp.float32)
            placed = _select_dot(
            inc, onehot, (((1,), (0,)), ((), ())))     # (8, L)
            hit = placed[6:7, :] > 0.5
            for c in range(n_pl):
                out_refs[c][0, s:s + 1, :] = jnp.where(
                    hit, placed[c:c + 1, :], plane_refs[c][0][s:s + 1, :])
            alive_out_ref[0, s:s + 1, :] = jnp.where(
                hit, 1.0, alive[s:s + 1, :])


def merge_fused(alive: jax.Array, inc: jax.Array,
                planes: Tuple[jax.Array, ...], K: int,
                interpret: bool = False):
    """alive (NT, B) f32 post-kill, inc (NT, 8, 2K) rolled-in buffers,
    planes 6x (NT, B); B % 8 == 0.  Free ranks computed in kernel.
    Returns (planes', alive')."""
    NT, B = alive.shape
    L = B // 8
    row = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    r3 = lambda a: a.reshape(NT, 8, L)
    n_pl = len(planes)
    outs = pl.pallas_call(
        partial(_merge_fused_kernel, K=K, L=L),
        out_shape=tuple(jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)
                        for _ in range(n_pl + 1)),
        grid=(NT,),
        in_specs=[row,
                  pl.BlockSpec((1, 8, 2 * K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [row] * n_pl,
        out_specs=tuple([row] * (n_pl + 1)),
        interpret=interpret,
    )(r3(alive), inc, *[r3(p) for p in planes])
    new_planes = tuple(o.reshape(NT, B) for o in outs[:n_pl])
    return new_planes, outs[n_pl].reshape(NT, B)

def _merge_kernel(act_ref, frank_ref, alive_ref, inc_ref, *plane_refs_out,
                  K, CB):
    n_pl = (len(plane_refs_out) - 1) // 2
    plane_refs = plane_refs_out[:n_pl]
    out_refs = plane_refs_out[n_pl:2 * n_pl]
    alive_out_ref = plane_refs_out[-1]

    # arrivals fill the lowest free-slot ranks, so most chunks receive
    # none: skip their placement matmul entirely (the passthrough write
    # is the HBM floor; measured 26 -> 11 ms per merge pass at 4096x9216)
    j = pl.program_id(1)

    @pl.when(act_ref[0, 0, j] == 0)
    def _():
        for c in range(n_pl):
            out_refs[c][0, 0, :] = plane_refs[c][0, 0, :]
        alive_out_ref[0, 0, :] = alive_ref[0, 0, :]

    @pl.when(act_ref[0, 0, j] != 0)
    def _():
        inc = inc_ref[0, :, :]                          # (8, 2K)
        K2 = 2 * K
        # both sign-blocks are compacted, so validity and arrival order
        # are pure iota arithmetic against the two counts — no relayouts
        n_m = jnp.sum(inc[6, :K]).astype(jnp.int32)
        n_p = jnp.sum(inc[6, K:]).astype(jnp.int32)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (K2, 1), 0)
        vrank = jnp.where(iota_s < K, iota_s, iota_s - K + n_m)  # (2K, 1)
        # boolean-armed jnp.where crashes the Mosaic compiler (tpu_compile
        # helper exit 1, bisected 2026-08-16) — compose with &/| instead
        valid = (((iota_s < K) & (iota_s < n_m))
                 | ((iota_s >= K) & (iota_s - K < n_p)))

        frank = frank_ref[0, 0, :]                      # (CB,) int32, -1=used
        onehot = ((vrank == frank[None, :]) & valid).astype(jnp.float32)
        placed = _select_dot(
            inc, onehot, (((1,), (0,)), ((), ())))         # (8, CB)
        hit = placed[6, :] > 0.5
        for c in range(n_pl):
            out_refs[c][0, 0, :] = jnp.where(hit, placed[c, :],
                                             plane_refs[c][0, 0, :])
        alive_out_ref[0, 0, :] = jnp.where(hit, 1.0, alive_ref[0, 0, :])


def merge(frank: jax.Array, alive: jax.Array, inc: jax.Array,
          planes: Tuple[jax.Array, ...], active=None,
          interpret: bool = False):
    """frank (NT, B) int32 free-slot ranks (-1 = occupied), alive (NT, B)
    f32 (post-kill), inc (NT, 8, 2K) rolled-in buffers, planes: six (NT, B)
    f32, active: optional (NT, NC) int32 per-chunk flags (0 = chunk holds
    no free-slot rank below the arrival count, placement skipped).
    Returns (planes', alive')."""
    NT, B = frank.shape
    K2 = inc.shape[-1]
    CB = _chunk(B)
    NC = B // CB
    if active is None:
        active = jnp.ones((NT, NC), jnp.int32)
    grid = (NT, NC)
    row = pl.BlockSpec((1, 1, CB), lambda i, j: (i, 0, j),
                       memory_space=pltpu.VMEM)
    n_pl = len(planes)
    outs = pl.pallas_call(
        partial(_merge_kernel, K=K2 // 2, CB=CB),
        out_shape=tuple(jax.ShapeDtypeStruct((NT, 1, B), jnp.float32)
                        for _ in range(n_pl + 1)),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, NC), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  row, row,
                  pl.BlockSpec((1, 8, K2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [row] * n_pl,
        out_specs=tuple([row] * (n_pl + 1)),
        interpret=interpret,
    )(active.reshape(NT, 1, NC), frank.reshape(NT, 1, B),
      alive.reshape(NT, 1, B), inc,
      *[p.reshape(NT, 1, B) for p in planes])
    new_planes = tuple(o.reshape(NT, B) for o in outs[:n_pl])
    return new_planes, outs[n_pl].reshape(NT, B)


# ---------------------------------------------------------------------------
# per-dimension driver
# ---------------------------------------------------------------------------

def exchange_dim(planes: Tuple[jax.Array, ...], alive: jax.Array,
                 ntiles: Tuple[int, ...], d: int, T: int, K: int,
                 interpret: bool = False, roll_fn=None, ks: int = None,
                 rows: bool = False):
    """One dimension's ±1-tile transfer on component planes.

    planes: (x, y, z, vx, vy, vz) each (NT, B) f32, tile-local coords;
    alive (NT, B) f32.  Returns (planes', alive').  Leavers beyond the
    face cap are dropped (count by alive-sum conservation outside).
    roll_fn(x, shift, axis) overrides the buffer wrap for sharded tile
    grids (neighbor-device fetch).

    rows=True (requires B % 8 == 0): the per-row v4 kernels — each
    sublane row exchanges with the same row of the neighbor tile under
    its own cap ks (default ``default_row_cap(K, B)``); the one-hot
    builds shrink 4x.  rows=False: the per-tile v3 kernels with cap K.
    """
    NT, B = alive.shape
    coord = planes[d]
    nt = tuple(ntiles)
    roll = roll_fn or (lambda a, s, ax: jnp.roll(a, s, axis=ax))
    if rows and B % 8 == 0:
        Ks = ks or default_row_cap(K, B)
        bufs, alive2 = extract_rows(coord, alive, planes, Ks, T,
                                    interpret=interpret)
        b6 = bufs.reshape(nt + (8, 8, 2 * Ks))
        minus = roll(b6[..., :Ks], -1, d)
        plus = roll(b6[..., Ks:], 1, d)
        inc = jnp.concatenate([minus, plus], axis=-1).reshape(
            NT, 8, 8 * 2 * Ks)
        shift = jnp.tile(jnp.concatenate(
            [jnp.full((Ks,), float(T), jnp.float32),
             jnp.full((Ks,), -float(T), jnp.float32)]), 8)
        inc = inc.at[:, d, :].add(
            jnp.where(inc[:, 6, :] > 0.5, shift, 0.0))
        return merge_rows(alive2, inc, planes, Ks, interpret=interpret)
    if B % 8 == 0:
        bufs, alive2 = extract_fused(coord, alive, planes, K, T,
                                     interpret=interpret)
    else:
        al = alive > 0.5
        lm = al & (coord < 0.0)
        lp = al & (coord >= float(T))
        rm = _chunked_cumsum(lm.astype(jnp.float32)).astype(jnp.int32) - 1
        rp = _chunked_cumsum(lp.astype(jnp.float32)).astype(jnp.int32) - 1
        rank = jnp.where(
            lm & (rm < K), rm,
            jnp.where(lp & (rp < K), K + rp, -1)).astype(jnp.int32)
        # overflow leavers (rank >= K) must still die: rank 2K matches no
        # one-hot column, so they are killed but extracted nowhere
        # (= dropped)
        kill_only = (lm & (rm >= K)) | (lp & (rp >= K))
        rank = jnp.where(kill_only, 2 * K, rank)
        bufs, alive2 = extract(rank, alive, planes, 2 * K,
                               interpret=interpret)

    # roll to neighbors: minus-going rows arrive at tile-1 along d, plus
    # at tile+1 (periodic), entering in the receiver's local frame
    b5 = bufs.reshape(nt + (8, 2 * K))
    minus = roll(b5[..., :K], -1, d)
    plus = roll(b5[..., K:], 1, d)
    inc = jnp.concatenate([minus, plus], axis=-1).reshape(NT, 8, 2 * K)
    shift = jnp.concatenate([jnp.full((K,), float(T), jnp.float32),
                             jnp.full((K,), -float(T), jnp.float32)])
    inc = inc.at[:, d, :].add(jnp.where(inc[:, 6, :] > 0.5, shift, 0.0))

    if B % 8 == 0:
        new_planes, alive3 = merge_fused(alive2, inc, planes, K,
                                         interpret=interpret)
        return new_planes, alive3

    free = ~(alive2 > 0.5)
    fr_incl = _chunked_cumsum(free.astype(jnp.float32))
    fr = fr_incl.astype(jnp.int32) - 1
    frank = jnp.where(free, fr, -1).astype(jnp.int32)

    # per-chunk activity for the merge: chunk c places an arrival iff its
    # first free slot's rank (= free count before the chunk) is below the
    # arrival count AND it has a free slot at all
    CB = _chunk(B)
    NC = B // CB
    ends = fr_incl[:, CB - 1::CB]                            # (NT, NC)
    base = jnp.concatenate(
        [jnp.zeros((NT, 1), fr_incl.dtype), ends[:, :-1]], axis=1)
    n_arr = jnp.sum(inc[:, 6, :], axis=1, keepdims=True)     # (NT, 1)
    active = ((base < n_arr) & (ends > base)).astype(jnp.int32)

    new_planes, alive3 = merge(frank, alive2, inc, planes, active=active,
                               interpret=interpret)
    return new_planes, alive3


# ---------------------------------------------------------------------------
# v5: FUSED all-dims exchange.  The three per-dim sweeps each re-stream
# every particle plane through HBM (extract reads 7 planes, merge reads 7
# and writes 7 — ~69 plane passes / ~20 GB per species at production
# size, and the measured per-dim exchange sits AT that HBM floor).  The
# fused pass touches the planes exactly TWICE — one extract, one merge —
# and routes multi-axis movers between the rolls in BUFFER space (tiny
# (NT, 8, W) arrays), preserving the per-dim semantics: a corner flow
# still hops x, then y, then z, with the frame shift applied per hop.
#
#   extract_all  — classify every leaver by its first out-of-range axis
#                  (x > y > z priority) into six per-direction blocks
#   x-roll       — face buffers to the +-x neighbor (+ x frame shift)
#   cleanup      — arrivals still out of range in y/z are compacted into
#                  extra buffers that join the next roll
#   y-roll, cleanup, z-roll
#   merge_all    — one kernel places all (compacted) arrival blocks into
#                  free slots
#
# Per-ROW variant only (row s trades with row s of the neighbor tile,
# like v4): it is the production configuration, and the one-hot builds —
# the other half of the exchange bill — shrink 4x with it.
# ---------------------------------------------------------------------------


def _scan_rows_any(m):
    """(R, W) f32 0/1 -> per-row inclusive lane prefix, any W (128-blocked
    matmul scan with a remainder block)."""
    return _scan_lanes_rows(m)[0]


def _extract_all_rows_kernel(alive_ref, *plane_refs_out, Ks, T, L):
    *plane_refs, buf_ref, alive_out_ref = plane_refs_out
    W = 6 * Ks
    x = plane_refs[0][0]                                # (8, L)
    y = plane_refs[1][0]
    z = plane_refs[2][0]
    alive = alive_ref[0]
    al = alive > 0.5
    Tf = float(T)
    xm = al & (x < 0.0)
    xp = al & (x >= Tf)
    xany = xm | xp
    ym = al & (~xany) & (y < 0.0)
    yp = al & (~xany) & (y >= Tf)
    yany = ym | yp
    zm = al & (~xany) & (~yany) & (z < 0.0)
    zp = al & (~xany) & (~yany) & (z >= Tf)
    masks = (xm, xp, ym, yp, zm, zp)
    col = jnp.full_like(x, -1.0)
    for i, mk in enumerate(masks):
        r = _scan_rows_any(mk.astype(jnp.float32)) - 1.0
        c = jnp.where(r < Ks, float(i * Ks) + r, float(W))  # overflow: kill
        col = jnp.where(mk, c, col)
    alive_out_ref[0] = jnp.where(col >= 0.0, 0.0, alive)

    kidx = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0).astype(
        jnp.float32)
    ones = jnp.ones((1, L), jnp.float32)
    zeros = jnp.zeros((1, L), jnp.float32)
    for s in range(8):
        onehot_t = (kidx == col[s:s + 1, :]).astype(jnp.float32)
        pay = jnp.concatenate(
            [r[0][s:s + 1, :] for r in plane_refs] + [ones, zeros],
            axis=0)                                     # (8, L)
        buf_ref[0, :, s * W:(s + 1) * W] = _select_dot(
            pay, onehot_t, (((1,), (1,)), ((), ())))         # (8, 6Ks)


def extract_all_rows(planes: Tuple[jax.Array, ...], alive: jax.Array,
                     Ks: int, T: int, interpret: bool = False):
    """Priority-classified extract over ALL dims in one plane pass.
    Returns (bufs (NT, 8, 8*6Ks) — row s's block at [s*6Ks, (s+1)*6Ks),
    direction order [xm, xp, ym, yp, zm, zp] each Ks wide — and
    alive_killed (NT, B))."""
    NT, B = alive.shape
    L = B // 8
    row = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    r3 = lambda a: a.reshape(NT, 8, L)
    W = 6 * Ks
    bufs, alive2 = pl.pallas_call(
        partial(_extract_all_rows_kernel, Ks=Ks, T=T, L=L),
        out_shape=(jax.ShapeDtypeStruct((NT, 8, 8 * W), jnp.float32),
                   jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)),
        grid=(NT,),
        in_specs=[row] + [row] * len(planes),
        out_specs=(pl.BlockSpec((1, 8, 8 * W), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM), row),
        interpret=interpret,
    )(r3(alive), *[r3(p) for p in planes])
    return bufs, alive2.reshape(NT, B)


def _cleanup_rows_kernel(inc_ref, set_ref, *extra_refs, W, Ke, T, axes):
    """Classify arrival columns of each row block against the REMAINING
    axes (payload rows ``axes``, priority order), compact the settled ones
    and the per-direction extras.  inc/set row blocks are W wide; each
    extra block Ke."""
    Tf = float(T)
    n_dir = 2 * len(axes)
    Wout = W + n_dir * Ke
    kidx = jax.lax.broadcasted_iota(jnp.int32, (Wout, W), 0).astype(
        jnp.float32)
    for s in range(8):
        blk = inc_ref[0, :, s * W:(s + 1) * W]          # (8, W)
        valid = blk[6:7, :] > 0.5                       # (1, W)
        masks = []
        taken = jnp.zeros_like(valid)
        for a in axes:
            c = blk[a:a + 1, :]
            m_m = valid & (~taken) & (c < 0.0)
            m_p = valid & (~taken) & (c >= Tf)
            masks += [m_m, m_p]
            taken = taken | m_m | m_p
        settled = valid & (~taken)
        # per-class (1, W) blocked scans (a stacked sublane concat of the
        # masks trips a Mosaic layout limitation at non-128-aligned W)
        r_set = _scan_rows_any(settled.astype(jnp.float32)) - 1.0
        col = jnp.where(settled, r_set, -1.0)           # settled: cap W
        for i in range(n_dir):
            r = _scan_rows_any(masks[i].astype(jnp.float32)) - 1.0
            c = jnp.where(r < Ke, float(W + i * Ke) + r, float(Wout))
            col = jnp.where(masks[i], c, col)
        onehot_t = (kidx == col).astype(jnp.float32)    # (Wout, W)
        placed = _select_dot(
            blk, onehot_t, (((1,), (1,)), ((), ())))         # (8, Wout)
        set_ref[0, :, s * W:(s + 1) * W] = placed[:, :W]
        for i in range(n_dir):
            extra_refs[i][0, :, s * Ke:(s + 1) * Ke] = \
                placed[:, W + i * Ke:W + (i + 1) * Ke]


def cleanup_rows(inc: jax.Array, W: int, Ke: int, T: int, axes,
                 interpret: bool = False):
    """inc (NT, 8, 8*W) row-blocked arrivals.  Returns (settled
    (NT, 8, 8*W), extras: 2*len(axes) arrays (NT, 8, 8*Ke) in
    [axis0-minus, axis0-plus, axis1-minus, ...] order)."""
    NT = inc.shape[0]
    n_dir = 2 * len(axes)
    outs = pl.pallas_call(
        partial(_cleanup_rows_kernel, W=W, Ke=Ke, T=T, axes=tuple(axes)),
        out_shape=(jax.ShapeDtypeStruct((NT, 8, 8 * W), jnp.float32),)
        + tuple(jax.ShapeDtypeStruct((NT, 8, 8 * Ke), jnp.float32)
                for _ in range(n_dir)),
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, 8, 8 * W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 8, 8 * W), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),)
        + tuple(pl.BlockSpec((1, 8, 8 * Ke), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_dir)),
        interpret=interpret,
    )(inc)
    return outs[0], outs[1:]


def _merge_all_rows_kernel(alive_ref, inc_ref, *plane_refs_out, blocks, L):
    """blocks: static tuple of (offset, width) — each individually
    compacted arrival run inside the row block."""
    n_pl = (len(plane_refs_out) - 1) // 2
    plane_refs = plane_refs_out[:n_pl]
    out_refs = plane_refs_out[n_pl:2 * n_pl]
    alive_out_ref = plane_refs_out[-1]
    KT = blocks[-1][0] + blocks[-1][1]

    alive = alive_ref[0]                                # (8, L)
    free = alive <= 0.5
    fr_incl = _scan_lanes_rows(free.astype(jnp.float32))[0]
    frank = jnp.where(free, fr_incl - 1.0, -1.0)        # per-row ranks

    for c in range(n_pl):
        out_refs[c][0] = plane_refs[c][0]
    alive_out_ref[0] = alive

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (KT, 1), 0).astype(
        jnp.float32)
    for s in range(8):
        inc_s = inc_ref[0, :, s * KT:(s + 1) * KT]      # (8, KT)
        flag = inc_s[6:7, :]                            # (1, KT)
        vrank = jnp.full((KT, 1), -1.0, jnp.float32)
        valid = jnp.zeros((KT, 1), jnp.bool_)
        n_before = jnp.zeros((), jnp.float32)
        for off, w in blocks:
            n_b = jnp.sum(flag[0, off:off + w])
            within = iota_s - float(off)
            in_blk = (within >= 0.0) & (within < float(w))
            vrank = jnp.where(in_blk, within + n_before, vrank)
            valid = valid | (in_blk & (within < n_b))
            n_before = n_before + n_b
        n_arr = n_before
        frank_s = frank[s:s + 1, :]                     # (1, L)
        has = jnp.sum(jnp.where((frank_s >= 0.0) & (frank_s < n_arr),
                                1.0, 0.0)) > 0.0

        @pl.when(has)
        def _(s=s, inc_s=inc_s, vrank=vrank, valid=valid, frank_s=frank_s):
            onehot = ((vrank == frank_s) & valid).astype(jnp.float32)
            placed = _select_dot(
            inc_s, onehot, (((1,), (0,)), ((), ())))     # (8, L)
            hit = placed[6:7, :] > 0.5
            for c in range(n_pl):
                out_refs[c][0, s:s + 1, :] = jnp.where(
                    hit, placed[c:c + 1, :], plane_refs[c][0][s:s + 1, :])
            alive_out_ref[0, s:s + 1, :] = jnp.where(
                hit, 1.0, alive[s:s + 1, :])


def merge_all_rows(alive: jax.Array, inc: jax.Array,
                   planes: Tuple[jax.Array, ...], blocks,
                   interpret: bool = False):
    """Multi-block per-row merge: inc (NT, 8, 8*KT) row-blocked; blocks =
    tuple of (offset, width) compacted runs within each row block."""
    NT, B = alive.shape
    L = B // 8
    KT = blocks[-1][0] + blocks[-1][1]
    row = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    r3 = lambda a: a.reshape(NT, 8, L)
    n_pl = len(planes)
    outs = pl.pallas_call(
        partial(_merge_all_rows_kernel, blocks=tuple(blocks), L=L),
        out_shape=tuple(jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)
                        for _ in range(n_pl + 1)),
        grid=(NT,),
        in_specs=[row,
                  pl.BlockSpec((1, 8, 8 * KT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [row] * n_pl,
        out_specs=tuple([row] * (n_pl + 1)),
        interpret=interpret,
    )(r3(alive), inc, *[r3(p) for p in planes])
    new_planes = tuple(o.reshape(NT, B) for o in outs[:n_pl])
    return new_planes, outs[n_pl].reshape(NT, B)


def default_edge_cap(Ks: int) -> int:
    """Cap for multi-axis (edge/corner) flows per hop: they need crossing
    two tile faces within one cadence window (~(M/T)^2 of the population),
    so Ks/4 with an 8-lane floor is ~10x the Poisson tail."""
    return max(8, Ks // 4)


def _roll_blocked(buf, nt, n_rows, w, d, sign, roll):
    """Roll a row-blocked buffer (NT, 8, n_rows*w) to the d-neighbor."""
    b = buf.reshape(nt + (8, n_rows, w))
    return roll(b, sign, d).reshape((-1, 8, n_rows * w))


def _shift_rows(inc, n_rows, parts, d, T):
    """Apply the receiver-frame coordinate shift to arrival buffers:
    parts = tuple of (width, shift_sign) runs per row block (minus-going
    arrivals entered from the +d side: coord += T; plus-going: -= T)."""
    KT = sum(w for w, _ in parts)
    shift = jnp.concatenate([
        jnp.full((w,), float(sgn) * float(T), jnp.float32)
        for w, sgn in parts])
    shift = jnp.tile(shift, n_rows)
    return inc.at[:, d, :].add(
        jnp.where(inc[:, 6, :] > 0.5, shift, 0.0))


def rebucket_exchange_all_rows(planes: Tuple[jax.Array, ...],
                               alive: jax.Array, ntiles: Tuple[int, ...],
                               T: int, Ks: int, Ke: int = None,
                               interpret: bool = False, roll_fns=None):
    """Fused all-dims per-row exchange: ONE extract pass, buffer-space
    routing (x -> y -> z hops on the small buffers), ONE merge pass.
    Same semantics as three sequential per-dim sweeps.  Returns
    (planes', alive', n_dropped)."""
    NT, B = alive.shape
    nt = tuple(ntiles)
    Ke = Ke or default_edge_cap(Ks)
    rolls = [((lambda a, s, ax=d: jnp.roll(a, s, axis=ax))
              if roll_fns is None else roll_fns[d]) for d in range(3)]
    n0 = jnp.sum(alive.astype(jnp.int32))

    bufs, alive2 = extract_all_rows(planes, alive, Ks, T,
                                    interpret=interpret)
    b = bufs.reshape(nt + (8, 8, 6, Ks))
    face = [b[..., i, :].reshape(NT, 8, 8 * Ks) for i in range(6)]

    def cat_blocks(blocks_list):
        """Concat row-blocked buffers along each row's column block."""
        parts = [bb.reshape(nt + (8, 8, -1)) for bb in blocks_list]
        return jnp.concatenate(parts, axis=-1).reshape(NT, 8, -1)

    # ---- x hop: face buffers only
    Wx = 2 * Ks
    inc_x = cat_blocks([
        _roll_blocked(face[0], nt, 8, Ks, 0, -1, rolls[0]),
        _roll_blocked(face[1], nt, 8, Ks, 0, 1, rolls[0])])
    inc_x = _shift_rows(inc_x, 8, ((Ks, 1), (Ks, -1)), 0, T)
    settled_x, (ym_e, yp_e, zm_e, zp_e) = cleanup_rows(
        inc_x, Wx, Ke, T, axes=(1, 2), interpret=interpret)

    # ---- y hop: extract's y faces + x-arrival extras
    Wy1 = Ks + Ke
    inc_y = cat_blocks([
        _roll_blocked(cat_blocks([face[2], ym_e]), nt, 8, Wy1, 1, -1,
                      rolls[1]),
        _roll_blocked(cat_blocks([face[3], yp_e]), nt, 8, Wy1, 1, 1,
                      rolls[1])])
    inc_y = _shift_rows(inc_y, 8, ((Wy1, 1), (Wy1, -1)), 1, T)
    settled_y, (zm_e2, zp_e2) = cleanup_rows(
        inc_y, 2 * Wy1, Ke, T, axes=(2,), interpret=interpret)

    # ---- z hop: extract's z faces + both cleanup extras (no cleanup
    # after: z is the last axis, everything is settled by construction)
    Wz1 = Ks + 2 * Ke
    inc_z = cat_blocks([
        _roll_blocked(cat_blocks([face[4], zm_e, zm_e2]), nt, 8, Wz1, 2,
                      -1, rolls[2]),
        _roll_blocked(cat_blocks([face[5], zp_e, zp_e2]), nt, 8, Wz1, 2,
                      1, rolls[2])])
    inc_z = _shift_rows(inc_z, 8, ((Wz1, 1), (Wz1, -1)), 2, T)

    # ---- merge: all blocks in one pass.  Block table = each compacted
    # run (settled_x run, settled_y run, and the six z sub-runs)
    inc = cat_blocks([settled_x, settled_y, inc_z])
    blocks = []
    off = 0
    for w in (Wx, 2 * Wy1):
        blocks.append((off, w))
        off += w
    for w in (Ks, Ke, Ke, Ks, Ke, Ke):
        blocks.append((off, w))
        off += w
    new_planes, alive3 = merge_all_rows(alive2, inc, planes,
                                        tuple(blocks),
                                        interpret=interpret)
    dropped = n0 - jnp.sum(alive3.astype(jnp.int32))
    return new_planes, alive3, dropped


def rebucket_exchange_planes(planes: Tuple[jax.Array, ...], alive: jax.Array,
                             ntiles: Tuple[int, ...], T: int, K: int,
                             interpret: bool = False, roll_fns=None,
                             ks: int = None, rows: bool = False,
                             fused: bool = True, impl: str = "auto",
                             ku: int = None):
    """Full 3D re-bucket on component planes.  rows=True with fused=True
    (the default) takes the single-pass v5 exchange; otherwise three
    sequential per-dim sweeps (corner flows ride two sweeps, like the
    reference's per-dim migration).  Returns (planes', alive',
    n_dropped).  roll_fns: per-dim buffer-wrap overrides for sharded tile
    grids.  ks/rows: see exchange_dim.

    impl: "gather" takes the v6 dynamic-lane-gather kernels
    (ops/pallas_gather_exchange — no one-hot builds, no MXU payload
    dots, structurally bit-exact); "onehot" the matmul kernels here;
    "auto" (default) picks gather whenever its layout precondition
    (B % 1024 == 0, 3-D tile grid) holds."""
    NT, B = alive.shape
    if impl != "onehot" and rows and len(ntiles) == 3:
        from . import pallas_gather_exchange as pgx
        if pgx.supported(B) or impl == "gather":
            Ks = pgx.round_cap(ks or default_row_cap(K, B))
            if fused:
                return pgx.rebucket_exchange_all_rows_g(
                    planes, alive, ntiles, T, Ks, interpret=interpret,
                    roll_fns=roll_fns,
                    KU=ku if ku else pgx.total_cap(Ks, K))
            n0 = jnp.sum(alive.astype(jnp.int32))
            for d in range(3):
                planes, alive = pgx.exchange_dim_g(
                    planes, alive, ntiles, d, T, Ks, interpret=interpret,
                    roll_fn=roll_fns[d] if roll_fns else None)
            dropped = n0 - jnp.sum(alive.astype(jnp.int32))
            return planes, alive, dropped
    if rows and fused and B % 8 == 0 and len(ntiles) == 3:
        Ks = ks or default_row_cap(K, B)
        return rebucket_exchange_all_rows(
            planes, alive, ntiles, T, Ks, interpret=interpret,
            roll_fns=roll_fns)
    n0 = jnp.sum(alive.astype(jnp.int32))
    for d in range(3):
        planes, alive = exchange_dim(
            planes, alive, ntiles, d, T, K, interpret=interpret,
            roll_fn=roll_fns[d] if roll_fns else None, ks=ks, rows=rows)
    dropped = n0 - jnp.sum(alive.astype(jnp.int32))
    return planes, alive, dropped
