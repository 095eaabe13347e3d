"""Gather-based ±1-tile exchange kernels (v6 of the sort-free re-bucket).

The one-hot/matmul exchange (ops/pallas_exchange.py) moves payloads with
(W, L) one-hot selection matrices and bit-exact 3-pass bf16-split MXU
dots.  Both halves are expensive: the (W, L) VPU iota-compare BUILDS
scale with W*L per sublane row, and the dots are thin (M = 8 payload
rows -> 6% MXU utilization) and tripled by the exactness split.

Mosaic lowers a *vreg-local dynamic lane gather*: ``jnp.take_along_axis``
on an (R, 128) block with per-lane int32 indices is a single hardware
shuffle and a BIT COPY (measured exact on v5e — experiments/
r4_gather_probe2.py).  This module rebuilds the exchange on that
primitive, chunk-major (one fori_loop over 128-lane chunks):

* per chunk, leaver ranks come from one (8,128) @ U128 triangular
  matmul (exact f32 counts, as in v4) plus a running cross-chunk base;
* *extract* inverts the chunk's rank with a 7-step binary search over
  the chunk cumsum, then composes two gathers (buffer lane -> chunk
  rank -> source lane) to copy payloads straight into the compacted
  buffer — no one-hot, no MXU payload pass;
* *merge* maps each free slot's rank to an arrival column with pure
  VPU arithmetic and gathers the payload from the (KT/128) arrival
  vregs with clamped indices + hit masks.

Exactness is structural (gathers copy bits), so the bf16 mantissa-split
machinery disappears entirely on this path.  Buffers are PAYLOAD-MAJOR
(NT, 7, 8, W): payload plane p of sublane row r at [p, r, :] — the
gather kernels produce per-payload (8, W) blocks natively, where the
one-hot dots produced payload-on-sublanes blocks.

Reference parity: same communication step as puExtractEmigrants3D /
puMigrate (src/pusher.c:782-1035) — per-dimension neighbor transfer
with frame shift, fixed-capacity buffers, append-at-free-slots;
overflow drops are counted by alive-sum conservation (the reference
corrupts memory instead, src/pusher.c:776,913).

Requires B % 1024 == 0 (each sublane row spans whole 128-lane vregs);
callers fall back to the one-hot kernels otherwise.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NPAY = 7        # x, y, z, vx, vy, vz, flag


def supported(B: int) -> bool:
    return B % 1024 == 0


def round_cap(k: int) -> int:
    """Buffer widths are whole vregs on this path (gather sources are
    (8, 128) blocks); rounding the cap UP only reduces drops."""
    return max(128, -(-k // 128) * 128)


def _tri_u128():
    i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    return (i <= j).astype(jnp.float32)


def _iota128():
    return jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)


def _binsearch128(cum, tgt):
    """Per-lane lower bound over a 128-lane monotone row: smallest idx
    with cum[:, idx] >= tgt, clamped to 127 (exact for f32 counts)."""
    pos = jnp.zeros(tgt.shape, jnp.int32)
    for s in (64, 32, 16, 8, 4, 2, 1):
        probe = pos + (s - 1)
        v = jnp.take_along_axis(cum, jnp.minimum(probe, 127), axis=1)
        pos = jnp.where(v < tgt, pos + s, pos)
    return jnp.minimum(pos, 127)


def _take(src, idx):
    return jnp.take_along_axis(src, idx, axis=1)


# ---------------------------------------------------------------------------
# generic gather extract: classify -> per-class compaction into a
# payload-major buffer.  Class c's leavers (in lane order) fill buffer
# lanes [c*Ks, c*Ks + rank); overflow (rank >= Ks) is killed but gets no
# buffer slot (= dropped, counted by the caller).
# ---------------------------------------------------------------------------

def _extract_g_kernel(alive_ref, *refs, n_cls, Ks, T, L, classify, G=1):
    plane_refs = refs[:6]
    buf_ref, alive_out_ref = refs[6], refs[7]
    NC = L // 128
    KV = Ks // 128

    buf_ref[...] = jnp.zeros_like(buf_ref)
    u = _tri_u128()
    iota = _iota128()
    tgt = (iota + 1).astype(jnp.float32)
    kk = iota.astype(jnp.float32)

    # group-unroll: U chunks of straight-line work per fori iteration.
    # The per-chunk bodies are SMALL single-vreg ops in a sequential
    # dependency chain; one chunk per iteration left the kernel bound by
    # per-iteration overhead (~30 cycles/vector-op effective — measured
    # round 5, PARITY.md).  The per-chunk placement guard is dropped for
    # the same reason: an unconditional binsearch+gather pipeline beats
    # a scalar branch around it at production leave rates (~3%, where
    # nearly every chunk has leavers anyway).
    U = min(4, NC)

    def tile_body(gg, _):
        def chunk_work(off, run):
            sl = (gg, slice(None), pl.ds(off, 128))
            alive_c = alive_ref[sl]
            planes_c = [plane_refs[p][sl] for p in range(6)]
            masks, leave = classify(planes_c, alive_c, T)
            alive_out_ref[sl] = jnp.where(leave, 0.0, alive_c)

            runs_new = []
            for cls in range(n_cls):
                mc = masks[cls].astype(jnp.float32)
                cumc = jax.lax.dot_general(
                    mc, u, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                n_c = cumc[:, 127:128]
                run_c = run[:, cls:cls + 1]
                runs_new.append(run_c + n_c)
                src = _binsearch128(cumc, tgt)          # rank -> lane
                for w in range(KV):
                    rel = kk + float(w * 128) - run_c   # buf-local rank
                    hit = (rel >= 0.0) & (rel < n_c)
                    idx2 = _take(src, jnp.clip(rel.astype(jnp.int32),
                                               0, 127))
                    bs = pl.ds(cls * Ks + w * 128, 128)
                    for p in range(6):
                        v = _take(planes_c[p], idx2)
                        buf_ref[gg, p, :, bs] = jnp.where(
                            hit, v, buf_ref[gg, p, :, bs])
                    buf_ref[gg, 6, :, bs] = jnp.where(
                        hit, 1.0, buf_ref[gg, 6, :, bs])

            return jnp.concatenate(runs_new, axis=1)

        def group_body(c, run):
            base = pl.multiple_of(c * (U * 128), U * 128)
            for k in range(U):
                run = chunk_work(base + k * 128, run)
            return run

        run = jax.lax.fori_loop(0, NC // U, group_body,
                                jnp.zeros((8, n_cls), jnp.float32))
        for k in range(NC - (NC // U) * U):        # static tail chunks
            run = chunk_work(((NC // U) * U + k) * 128, run)
        return 0

    jax.lax.fori_loop(0, G, tile_body, 0)


def _classify_dim(d: int):
    def classify(planes, alive, T):
        al = alive > 0.5
        c = planes[d]
        lm = al & (c < 0.0)
        lp = al & (c >= float(T))
        return (lm, lp), lm | lp
    return classify


def _classify_all(planes, alive, T):
    al = alive > 0.5
    Tf = float(T)
    x, y, z = planes[0], planes[1], planes[2]
    xm = al & (x < 0.0)
    xp = al & (x >= Tf)
    xa = xm | xp
    ym = al & (~xa) & (y < 0.0)
    yp = al & (~xa) & (y >= Tf)
    ya = ym | yp
    zm = al & (~xa) & (~ya) & (z < 0.0)
    zp = al & (~xa) & (~ya) & (z >= Tf)
    return (xm, xp, ym, yp, zm, zp), xa | ya | zm | zp


def _classify_any(planes, alive, T):
    """Single class: EVERY leaver, direction resolved later by the
    cheap splitter pass over the compacted buffer (see
    extract_compact_rows_g)."""
    al = alive > 0.5
    Tf = float(T)
    x, y, z = planes[0], planes[1], planes[2]
    leave = al & ((x < 0.0) | (x >= Tf) | (y < 0.0) | (y >= Tf)
                  | (z < 0.0) | (z >= Tf))
    return (leave,), leave


def extract_rows_g(coord_d: int, alive: jax.Array,
                   planes: Tuple[jax.Array, ...], Ks: int, T: int,
                   interpret: bool = False):
    """Per-dim gather extract.  Returns (bufs (NT, 7, 8, 2*Ks) — minus
    block [0, Ks), plus [Ks, 2Ks), payload-major — and alive_killed
    (NT, B)).  Ks must be a multiple of 128."""
    return _extract_g(alive, planes, _classify_dim(coord_d), 2, Ks, T,
                      interpret)


def extract_all_rows_g(alive: jax.Array, planes: Tuple[jax.Array, ...],
                       Ks: int, T: int, interpret: bool = False):
    """Priority-classified (x > y > z) gather extract over all dims in
    one pass: direction blocks [xm, xp, ym, yp, zm, zp] each Ks wide."""
    return _extract_g(alive, planes, _classify_all, 6, Ks, T, interpret)


def extract_compact_rows_g(alive: jax.Array, planes: Tuple[jax.Array, ...],
                           KU: int, T: int, interpret: bool = False):
    """Single-class gather extract: ALL leavers compacted into one
    (NT, 7, 8, KU) run, direction not yet resolved.  The full-B chunk
    loop then pays ONE cumsum + ONE binsearch + ONE gather set per
    chunk instead of six (measured 101 -> ~30 ms on the headline tile
    grid); a cleanup_rows_g splitter over the KU-wide buffer resolves
    directions at ~B/KU of the cost."""
    return _extract_g(alive, planes, _classify_any, 1, KU, T, interpret)


def _tiles_per_program(NT: int, per_tile_bytes: int,
                       budget: int = 12_000_000) -> int:
    """Largest power-of-two divisor of NT whose double-buffered VMEM
    window estimate stays under budget.  One tile per program leaves the
    kernels PER-PROGRAM-OVERHEAD-bound at production tile counts (4096
    programs of ~0.5 MB blocks); batching tiles amortizes the program
    prologue/DMA-issue cost."""
    G = 1
    while (NT % (2 * G) == 0 and 2 * G * per_tile_bytes * 2 <= budget
           and 2 * G <= 32):
        G *= 2
    return G


def _extract_g(alive, planes, classify, n_cls, Ks, T, interpret):
    NT, B = alive.shape
    assert B % 1024 == 0 and Ks % 128 == 0
    L = B // 8
    per_tile = (8 * L * 4) * 8 + NPAY * 8 * n_cls * Ks * 4
    G = _tiles_per_program(NT, per_tile)
    row = pl.BlockSpec((G, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    r3 = lambda a: a.reshape(NT, 8, L)
    bufs, alive2 = pl.pallas_call(
        partial(_extract_g_kernel, n_cls=n_cls, Ks=Ks, T=T, L=L,
                classify=classify, G=G),
        out_shape=(jax.ShapeDtypeStruct((NT, NPAY, 8, n_cls * Ks),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)),
        grid=(NT // G,),
        in_specs=[row] * 7,
        out_specs=(pl.BlockSpec((G, NPAY, 8, n_cls * Ks),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM), row),
        interpret=interpret,
    )(r3(alive), *[r3(p) for p in planes])
    return bufs, alive2.reshape(NT, B)


# ---------------------------------------------------------------------------
# generic gather merge: place compacted arrival blocks into free slots.
# blocks: static ((offset, width), ...) runs inside the arrival buffer,
# each individually compacted (valid prefix, flag row 6 > 0.5).
#
# SPILL PASSES: free slots and arrivals both live on sublane rows, and a
# single row's arrivals can exceed its free slots even when the tile as
# a whole has room (plasma density compressions routinely push one row
# past the mean — measured 15.7k drops over a 176-step headline window
# when the merge was row-bound).  Pass 0 places each row's own arrivals;
# passes p = 1..7 place row (r - p) % 8's LEFTOVER arrivals into row r's
# remaining free slots (the arrival block is sublane-rolled by p, a
# bit-exact vreg shuffle — experiments/r4_roll_probe.py).  Each spill
# pass is runtime-guarded on leftovers actually existing, so the common
# (balanced) case pays one scalar check per pass.  Net effect: the free
# pool is TILE-wide, matching the per-tile one-hot kernels' drop
# behavior while keeping the cheap gather transport.
# ---------------------------------------------------------------------------

def _merge_g_kernel(alive_ref, inc_ref, *refs, blocks, KT, L, G=1):
    plane_refs = refs[:6]
    out_refs = refs[6:12]
    alive_out_ref = refs[12]
    consumed_ref = refs[13]                             # scratch (8, 128)
    NC = L // 128
    SV = KT // 128
    u = _tri_u128()

    def tile_body(gg, _):
        flag = inc_ref[gg, 6]                           # (8, KT)
        n_bs = [jnp.sum(flag[:, off:off + w], axis=1, keepdims=True)
                for off, w in blocks]
        n_arr = sum(n_bs)                               # (8, 1)

        def run_pass(p, first):
            """Place source row (r - p) % 8's unconsumed arrivals into
            dest row r's free slots, lowest-rank first.  first=True
            additionally copies stay-behind payloads/alive through.

            Pass 0 runs GROUP-UNROLLED (U chunks of straight-line work
            per fori iteration) with UNCONDITIONAL placement: the
            per-chunk scalar guard and one-chunk iterations left the
            kernel at ~30 cycles/vector-op effective (PARITY.md round-5
            measurements); at production leave rates nearly every chunk
            places arrivals anyway, and masked placement on an empty
            chunk is a no-op.  Spill passes (p >= 1) are rare and keep
            the compact guarded one-chunk loop to bound code size."""
            roll = (lambda x: jnp.roll(x, p, axis=0)) if p else (
                lambda x: x)
            nb_p = [roll(nb) for nb in n_bs]
            na_p = roll(n_arr)
            co_p = roll(consumed_ref[...][:, :1])
            n_avail = na_p - co_p                       # per DEST row

            def place(sl, al_c, run, frank_c, take_any):
                # source-row arrival rank -> arrival column (piecewise
                # over the static blocks, counts from the source row)
                arank = co_p + frank_c
                col = jnp.full((8, 128), -1.0, jnp.float32)
                cum_prev = jnp.zeros((8, 1), jnp.float32)
                for (boff, _w), n_b in zip(blocks, nb_p):
                    inb = (arank >= cum_prev) & (arank < cum_prev + n_b)
                    col = jnp.where(
                        inb, float(boff) + arank - cum_prev, col)
                    cum_prev = cum_prev + n_b
                coli = col.astype(jnp.int32)
                hit_any = take_any & (col >= 0.0)
                for pp in range(6):
                    out_c = (plane_refs[pp][sl] if first
                             else out_refs[pp][sl])
                    for v in range(SV):
                        idxv = coli - v * 128
                        hitv = hit_any & (idxv >= 0) & (idxv < 128)
                        src = roll(inc_ref[gg, pp, :,
                                           pl.ds(v * 128, 128)])
                        out_c = jnp.where(
                            hitv, _take(src, jnp.clip(idxv, 0, 127)),
                            out_c)
                    out_refs[pp][sl] = out_c
                alive_out_ref[sl] = jnp.where(hit_any, 1.0, al_c)

            def chunk_work(off, carry):
                run, takes = carry
                sl = (gg, slice(None), pl.ds(off, 128))
                al_c = alive_ref[sl] if first else alive_out_ref[sl]
                free_c = (al_c <= 0.5).astype(jnp.float32)
                cum_c = jax.lax.dot_general(
                    free_c, u, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                frank_c = run + cum_c - 1.0             # per-lane rank
                take_any = (free_c > 0.5) & (frank_c < n_avail)
                got = jnp.sum(jnp.where(take_any, 1.0, 0.0), axis=1,
                              keepdims=True)

                if first:
                    place(sl, al_c, run, frank_c, take_any)
                else:
                    @pl.when(jnp.sum(got) > 0.5)
                    def _():
                        place(sl, al_c, run, frank_c, take_any)

                return run + cum_c[:, 127:128], takes + got

            if first:
                U = min(4, NC)

                def group_body(c, carry):
                    base = pl.multiple_of(c * (U * 128), U * 128)
                    for k in range(U):
                        carry = chunk_work(base + k * 128, carry)
                    return carry

                carry = jax.lax.fori_loop(
                    0, NC // U, group_body,
                    (jnp.zeros((8, 1), jnp.float32),
                     jnp.zeros((8, 1), jnp.float32)))
                for k in range(NC - (NC // U) * U):  # static tail chunks
                    carry = chunk_work(((NC // U) * U + k) * 128, carry)
                _, takes = carry
            else:
                def chunk_body(c, carry):
                    off = pl.multiple_of(c * 128, 128)
                    return chunk_work(off, carry)

                _, takes = jax.lax.fori_loop(
                    0, NC, chunk_body, (jnp.zeros((8, 1), jnp.float32),
                                        jnp.zeros((8, 1), jnp.float32)))
            # takes are indexed by DEST row; credit the SOURCE row
            back = jnp.roll(takes, -p, axis=0) if p else takes
            consumed_ref[...] = jnp.broadcast_to(
                consumed_ref[...][:, :1] + back, (8, 128))

        consumed_ref[...] = jnp.zeros_like(consumed_ref)
        # Pass 0 + 7 statically-unrolled spill passes.  All 8 are
        # REQUIRED for the tile-wide free-pool guarantee (arrivals
        # concentrated on one sublane row may need every other row's
        # free slots); each spill pass is runtime-guarded so balanced
        # tiles pay one scalar check.  The unroll is the dominant Mosaic
        # code-size term of this kernel — if compile time ever forces a
        # cap, leftovers after the last pass become counted drops, so
        # any cap must be an explicit knob, not a silent default.
        run_pass(0, True)
        for p in range(1, 8):
            @pl.when(jnp.sum(n_arr)
                     - jnp.sum(consumed_ref[...][:, :1]) > 0.5)
            def _(p=p):
                run_pass(p, False)
        return 0

    jax.lax.fori_loop(0, G, tile_body, 0)


def merge_rows_g(alive: jax.Array, inc: jax.Array,
                 planes: Tuple[jax.Array, ...], blocks,
                 interpret: bool = False):
    """Gather merge: inc (NT, 7, 8, KT) payload-major arrival buffers,
    blocks = static ((offset, width), ...) compacted runs.  Arrivals
    fill each row's lowest free slots, spilling round-robin to the
    other rows when a row runs out (tile-wide free pool).  Returns
    (planes', alive')."""
    NT, B = alive.shape
    assert B % 1024 == 0
    KT = inc.shape[-1]
    assert KT % 128 == 0
    L = B // 8
    per_tile = (8 * L * 4) * 14 + NPAY * 8 * KT * 4
    G = _tiles_per_program(NT, per_tile)
    row = pl.BlockSpec((G, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    r3 = lambda a: a.reshape(NT, 8, L)
    outs = pl.pallas_call(
        partial(_merge_g_kernel, blocks=tuple(blocks), KT=KT, L=L, G=G),
        out_shape=tuple(jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)
                        for _ in range(7)),
        grid=(NT // G,),
        in_specs=[row,
                  pl.BlockSpec((G, NPAY, 8, KT), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + [row] * 6,
        out_specs=tuple([row] * 7),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        interpret=interpret,
    )(r3(alive), inc, *[r3(p) for p in planes])
    new_planes = tuple(o.reshape(NT, B) for o in outs[:6])
    return new_planes, outs[6].reshape(NT, B)


# ---------------------------------------------------------------------------
# cleanup (fused all-dims path): re-classify arrival columns against the
# remaining axes and compact settled + per-direction extras.  Operates on
# the small (NT, 7, 8, W) buffers; same gather machinery with L -> W.
# ---------------------------------------------------------------------------

def _cleanup_g_kernel(inc_ref, *out_refs, W, Ke, T, axes, G=1):
    n_dir = 2 * len(axes)
    set_ref = out_refs[0]
    extra_refs = out_refs[1:]
    NCw = W // 128
    Tf = float(T)

    set_ref[...] = jnp.zeros_like(set_ref)
    for r in extra_refs:
        r[...] = jnp.zeros_like(r)

    u = _tri_u128()
    iota = _iota128()
    tgt = (iota + 1).astype(jnp.float32)
    kk = iota.astype(jnp.float32)
    n_cls = n_dir + 1
    caps = [W] + [Ke] * n_dir

    # group-unroll + unconditional masked placement: see the extract
    # kernel's note (one-chunk guarded fori iterations are overhead-
    # bound; masked placement on an empty class is a no-op)
    U = min(4, NCw)

    def tile_body(gg, _):
        def chunk_work(off, run):
            flag_c = inc_ref[gg, 6, :, pl.ds(off, 128)]
            valid = flag_c > 0.5
            pays_c = [inc_ref[gg, p, :, pl.ds(off, 128)]
                      for p in range(NPAY)]
            masks = []
            taken = jnp.zeros_like(valid)
            for a in axes:
                cc = pays_c[a]
                m_m = valid & (~taken) & (cc < 0.0)
                m_p = valid & (~taken) & (cc >= Tf)
                masks += [m_m, m_p]
                taken = taken | m_m | m_p
            masks = [valid & (~taken)] + masks          # class 0: settled

            runs_new = []
            for cls in range(n_cls):
                mc = masks[cls].astype(jnp.float32)
                cumc = jax.lax.dot_general(
                    mc, u, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                n_c = cumc[:, 127:128]
                run_c = run[:, cls:cls + 1]
                runs_new.append(run_c + n_c)
                ref = set_ref if cls == 0 else extra_refs[cls - 1]
                src = _binsearch128(cumc, tgt)
                for w in range(caps[cls] // 128):
                    rel = kk + float(w * 128) - run_c
                    hit = (rel >= 0.0) & (rel < n_c)
                    idx2 = _take(src, jnp.clip(rel.astype(jnp.int32),
                                               0, 127))
                    for p in range(NPAY):
                        v = _take(pays_c[p], idx2)
                        cur = ref[gg, p, :, pl.ds(w * 128, 128)]
                        ref[gg, p, :, pl.ds(w * 128, 128)] = \
                            jnp.where(hit, v, cur)

            return jnp.concatenate(runs_new, axis=1)

        def group_body(c, run):
            base = pl.multiple_of(c * (U * 128), U * 128)
            for k in range(U):
                run = chunk_work(base + k * 128, run)
            return run

        run = jax.lax.fori_loop(0, NCw // U, group_body,
                                jnp.zeros((8, n_cls), jnp.float32))
        for k in range(NCw - (NCw // U) * U):      # static tail chunks
            run = chunk_work(((NCw // U) * U + k) * 128, run)
        return 0

    jax.lax.fori_loop(0, G, tile_body, 0)


def cleanup_rows_g(inc: jax.Array, Ke: int, T: int, axes,
                   interpret: bool = False):
    """inc (NT, 7, 8, W) arrivals; classify against remaining ``axes``
    (payload-row indices), compact settled (cap W — always sufficient)
    and per-direction extras (cap Ke).  Returns (settled (NT, 7, 8, W),
    extras tuple of 2*len(axes) arrays (NT, 7, 8, Ke))."""
    NT, _, _, W = inc.shape
    assert W % 128 == 0 and Ke % 128 == 0
    n_dir = 2 * len(axes)
    per_tile = NPAY * 8 * (2 * W + n_dir * Ke) * 4
    G = _tiles_per_program(NT, per_tile)
    blk = lambda w: pl.BlockSpec((G, NPAY, 8, w), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_cleanup_g_kernel, W=W, Ke=Ke, T=T, axes=tuple(axes),
                G=G),
        out_shape=(jax.ShapeDtypeStruct((NT, NPAY, 8, W), jnp.float32),)
        + tuple(jax.ShapeDtypeStruct((NT, NPAY, 8, Ke), jnp.float32)
                for _ in range(n_dir)),
        grid=(NT // G,),
        in_specs=[blk(W)],
        out_specs=(blk(W),) + tuple(blk(Ke) for _ in range(n_dir)),
        interpret=interpret,
    )(inc)
    return outs[0], outs[1:]


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------

def _shift_block(inc: jax.Array, d: int, T: int, parts):
    """Receiver-frame coordinate shift on a payload-major buffer:
    parts = ((width, sign), ...) runs along the last axis."""
    shift = jnp.concatenate([
        jnp.full((w,), float(sgn) * float(T), jnp.float32)
        for w, sgn in parts])
    return inc.at[:, d].add(
        jnp.where(inc[:, 6] > 0.5, shift[None, None, :], 0.0))


def exchange_dim_g(planes: Tuple[jax.Array, ...], alive: jax.Array,
                   ntiles: Tuple[int, ...], d: int, T: int, Ks: int,
                   interpret: bool = False, roll_fn=None):
    """One dimension's ±1-tile transfer via the gather kernels.
    Semantics match pallas_exchange.exchange_dim(rows=True) with the
    cap rounded up to a vreg multiple.  Returns (planes', alive')."""
    NT, B = alive.shape
    Ks = round_cap(Ks)
    nt = tuple(ntiles)
    roll = roll_fn or (lambda a, s, ax: jnp.roll(a, s, axis=ax))
    bufs, alive2 = extract_rows_g(d, alive, planes, Ks, T,
                                  interpret=interpret)
    b = bufs.reshape(nt + (NPAY, 8, 2 * Ks))
    minus = roll(b[..., :Ks], -1, d)
    plus = roll(b[..., Ks:], 1, d)
    inc = jnp.concatenate([minus, plus], axis=-1).reshape(
        NT, NPAY, 8, 2 * Ks)
    inc = _shift_block(inc, d, T, ((Ks, 1), (Ks, -1)))
    return merge_rows_g(alive2, inc, planes,
                        ((0, Ks), (Ks, Ks)), interpret=interpret)


def total_cap(Ks: int, K: int = None) -> int:
    """Default single-class extract cap (TOTAL leavers per sublane row).
    3*Ks keeps ~1.5x headroom over the isotropic mean total flux (the six
    per-face caps aggregated to 6*Ks gave ~3x); for small face caps the
    Poisson tail dominates, so when the tile-level face cap K is known the
    cap floors at mean_total + 5 sigma (mean per row ~ K/2, sigma
    sqrt of that) — the same statistic tiled_sim sizes K itself with."""
    ku = 3 * Ks
    if K is not None:
        mean_row = K / 2.0
        ku = max(ku, int(mean_row + 5.0 * mean_row ** 0.5) + 1)
    return round_cap(ku)


def rebucket_exchange_all_rows_g(planes: Tuple[jax.Array, ...],
                                 alive: jax.Array,
                                 ntiles: Tuple[int, ...], T: int, Ks: int,
                                 Ke: int = None, interpret: bool = False,
                                 roll_fns=None, KU: int = None):
    """Fused all-dims gather exchange: ONE extract pass, buffer-space
    x -> y -> z hops with cleanups, ONE merge pass (same structure and
    semantics as pallas_exchange.rebucket_exchange_all_rows).  Returns
    (planes', alive', n_dropped)."""
    NT, B = alive.shape
    nt = tuple(ntiles)
    Ks = round_cap(Ks)
    Ke = round_cap(Ke if Ke is not None else max(128, Ks // 4))
    rolls = [((lambda a, s, ax=dd: jnp.roll(a, s, axis=ax))
              if roll_fns is None else roll_fns[dd]) for dd in range(3)]
    n0 = jnp.sum(alive.astype(jnp.int32))

    # single-class extract over the full B, then direction split over
    # the small compacted buffer (KU: see total_cap; callers may widen
    # it via tiles:exchangeTotalCap for anisotropic/beaming decks)
    KU = round_cap(KU) if KU else total_cap(Ks)
    bufs, alive2 = extract_compact_rows_g(alive, planes, KU, T,
                                          interpret=interpret)
    _, face6 = cleanup_rows_g(bufs, Ks, T, axes=(0, 1, 2),
                              interpret=interpret)
    face = [f.reshape(nt + (NPAY, 8, Ks)) for f in face6]

    cat = lambda xs: jnp.concatenate(xs, axis=-1)
    flat = lambda x: x.reshape((NT, NPAY, 8, x.shape[-1]))
    grid5 = lambda x: x.reshape(nt + (NPAY, 8, x.shape[-1]))

    # ---- x hop: face buffers only
    inc_x = flat(cat([rolls[0](face[0], -1, 0), rolls[0](face[1], 1, 0)]))
    inc_x = _shift_block(inc_x, 0, T, ((Ks, 1), (Ks, -1)))
    settled_x, (ym_e, yp_e, zm_e, zp_e) = cleanup_rows_g(
        inc_x, Ke, T, axes=(1, 2), interpret=interpret)
    Wx = 2 * Ks

    # ---- y hop: extract's y faces + x-arrival extras
    Wy1 = Ks + Ke
    ym_b = cat([face[2], grid5(ym_e)])
    yp_b = cat([face[3], grid5(yp_e)])
    inc_y = flat(cat([rolls[1](ym_b, -1, 1), rolls[1](yp_b, 1, 1)]))
    inc_y = _shift_block(inc_y, 1, T, ((Wy1, 1), (Wy1, -1)))
    settled_y, (zm_e2, zp_e2) = cleanup_rows_g(
        inc_y, Ke, T, axes=(2,), interpret=interpret)

    # ---- z hop (last axis: arrivals are settled by construction)
    Wz1 = Ks + 2 * Ke
    zm_b = cat([face[4], grid5(zm_e), grid5(zm_e2)])
    zp_b = cat([face[5], grid5(zp_e), grid5(zp_e2)])
    inc_z = flat(cat([rolls[2](zm_b, -1, 2), rolls[2](zp_b, 1, 2)]))
    inc_z = _shift_block(inc_z, 2, T, ((Wz1, 1), (Wz1, -1)))

    # ---- merge: settled_x + settled_y + the six z sub-runs, each an
    # individually compacted block
    inc = cat([settled_x, settled_y, inc_z])
    blocks = []
    off = 0
    for w in (Wx, 2 * Wy1, Ks, Ke, Ke, Ks, Ke, Ke):
        blocks.append((off, w))
        off += w
    new_planes, alive3 = merge_rows_g(alive2, inc, planes, tuple(blocks),
                                      interpret=interpret)
    dropped = n0 - jnp.sum(alive3.astype(jnp.int32))
    return new_planes, alive3, dropped
