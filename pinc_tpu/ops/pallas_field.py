"""Pallas kernels for the per-step field glue around the Poisson solve.

The mega-fused step (tiled_sim._make_scan_steps_mega) spends ~6 ms/step of
XLA work turning the solved potential back into padded E-field tiles:

    E = -gradient(phi)            # 6 full-grid rolls + stack  (~3.7 ms)
    ep5 = pad_tiles_cmajor(E, ts) # tile transpose + halo concat (~2.3 ms)

both of which are pure data movement whose HBM-bandwidth floor is ~0.15 ms.
``efield_tiles`` fuses them into one kernel that reads phi once and writes
the (NT, C, P, P*P) component-major tiles the pic_step kernel consumes.

Layout trick: phi enters TRANSPOSED as (y, x, z).  Then per (tx, ty) tile
column (one program each):

* x-difference = a sublane shift (x is the minor-2 dim, matching the
  output's x-offset rows),
* y-difference = a major-axis slice (free),
* z-difference = a lane roll (z stays the full lane axis, so the periodic
  wrap is exact with no padding),
* the (y, z) -> y*P+z lane pack is a concat of per-y MAJOR-axis slices —
  the one relayout the (x, y, z) orientation would have needed (a
  sublane-extract per y) never appears.

x/y periodic wrap is prebaked by an XLA pad of M+1 / M+2 planes (~0.1 ms);
z wraps in-lane via pltpu.roll.

Reference parity: gFinDiff1st (src/grid.c:226-261) negated, i.e. the
E = -grad phi sequence of src/main.c:178-180, plus the ghost-layer read
pattern of gHaloOp(TOHALO) — rebuilt as one VMEM-resident pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiled import TileSpec


def _efield_kernel(phi_ref, out_ref, *, T, M, P, ntz, nz, out_dtype):
    i = pl.program_id(0)          # tx
    j = pl.program_id(1)          # ty
    Q = P + 2
    # slab: y, x windows of Q nodes starting at node offset -(M+1);
    # slab[s] holds node offset s - (M+1), s in [0, Q)
    slab = phi_ref[pl.ds(j * T, Q), pl.ds(i * T, Q), :]     # (Q, Q, nz)
    # E_d = 0.5*(phi[i-1] - phi[i+1])  (= -gradient, main.c:178-180)
    Ex = 0.5 * (slab[1:P + 1, 0:P, :] - slab[1:P + 1, 2:P + 2, :])
    Ey = 0.5 * (slab[0:P, 1:P + 1, :] - slab[2:P + 2, 1:P + 1, :])
    mid = slab[1:P + 1, 1:P + 1, :]
    # pltpu.roll requires non-negative shifts: -1 == nz - 1 (periodic)
    Ez = 0.5 * (pltpu.roll(mid, 1, axis=2) - pltpu.roll(mid, nz - 1, axis=2))
    Ers = []
    for E in (Ex, Ey, Ez):
        # Er[.., l] = E[.., l - M]: lane l of tile window tz*T is node
        # offset l - M, so the window slice below starts right at -M
        Er = pltpu.roll(E, M, axis=2) if M else E
        # the last tile's window wraps: extend by the first P-T lanes
        Ers.append(jnp.concatenate(
            [Er, jax.lax.slice_in_dim(Er, 0, P - T, axis=2)], axis=2))
    for tz in range(ntz):
        packs = []
        for Er in Ers:
            w = jax.lax.slice_in_dim(Er, tz * T, tz * T + P, axis=2)
            # (P y, P x, P z) -> rows x, lanes y*P+z
            packs.append(jnp.concatenate([w[y] for y in range(P)],
                                         axis=-1))
        # emit the (C*P, P*P) matrix the pic_step gather consumes
        # directly (pre-merged: a bf16 in-kernel (C,P,..)->(C*P,..)
        # reshape downstream is a Mosaic unsupported shape cast).  The
        # dtype cast happens on the final 2D tile only: when the
        # consumer runs bf16 MXU matmuls it casts the E tiles per-tile
        # anyway, so emitting bf16 here is bit-identical physics at
        # half the HBM write traffic.
        out_ref[tz, :, :] = jnp.concatenate(
            packs, axis=0).astype(out_dtype)


def efield_tiles(phi: jax.Array, ts: TileSpec,
                 interpret: bool = False,
                 out_dtype=jnp.float32,
                 transposed: bool = False) -> jax.Array:
    """phi (X, Y, Z) f32 -> padded component-major E tiles (NT, C*P,
    P*P) — ``pad_tiles_cmajor(-gradient(phi), ts)`` with the (C, P) axes
    pre-merged into the gather-matmul row layout (cast to ``out_dtype``
    after the difference stencil).  transposed=True: phi is already in
    the (y, x, z) orientation (e.g. straight from ``fold_global_t``)."""
    assert ts.n_dims == 3, "efield_tiles is 3D"
    nx, ny, nz = ts.grid
    T, M, P = ts.T, ts.M, ts.P
    ntx, nty, ntz = ts.ntiles
    # (y, x, z) orientation + periodic x/y pad of (M+1, M+2) planes
    pt = (phi.astype(jnp.float32) if transposed
          else jnp.transpose(phi.astype(jnp.float32), (1, 0, 2)))
    pad = ((M + 1, M + 2), (M + 1, M + 2), (0, 0))
    pt = jnp.pad(pt, pad, mode="wrap")

    out = pl.pallas_call(
        partial(_efield_kernel, T=T, M=M, P=P, ntz=ntz, nz=nz,
                out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((ts.NT, 3 * P, P * P), out_dtype),
        grid=(ntx, nty),
        in_specs=[pl.BlockSpec((ny + 2 * M + 3, nx + 2 * M + 3, nz),
                               lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ntz, 3 * P, P * P),
                               lambda i, j: (i * nty + j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt)
    return out


# ---------------------------------------------------------------------------
# Fold: deposited tile blocks -> global charge density
# ---------------------------------------------------------------------------

def _zfold(piece_of, nty, na, ntz, T, M, P, nz):
    """Per-(y, a-range) z overlap-add: ntz windows of P lanes at stride T
    -> (nty, na, nz) with periodic wrap.  piece_of(tz) -> (nty, na, P)
    holding window lanes [tz*T, tz*T + P) of the z buffer (buffer lane l
    <-> global z = l - M).  Consecutive windows overlap by P - T = 2M+1
    lanes, so: heads (first T lanes) concatenate exactly; tails (last
    2M+1) land at stride T starting at lane T and never overlap each
    other (T > 2M+1)."""
    heads, tails = [], []
    zpad = None
    for tz in range(ntz):
        p = piece_of(tz)
        heads.append(jax.lax.slice_in_dim(p, 0, T, axis=2))
        tails.append(jax.lax.slice_in_dim(p, T, P, axis=2))
        if T > 2 * M + 1:
            if zpad is None:
                zpad = jnp.zeros((nty, na, T - (2 * M + 1)), jnp.float32)
            tails.append(zpad)
    base = jnp.concatenate(heads, axis=2)          # buffer lanes [0, nz)
    tailbuf = jnp.concatenate(tails, axis=2)       # buffer lanes [T, T+nz)
    # out[g] = base[g + M] + tailbuf[g - T + M]  (mod nz)
    out = pltpu.roll(base, nz - M, axis=2) if M else base
    return out + pltpu.roll(tailbuf, (T - M) % nz, axis=2)


def _fold_kernel(t_ref, out_ref, *, T, M, P, nty, ntz, nz):
    """Grid (ntx, 3): program (i, k) adds x-slab (i + k - 1)'s
    contribution into the resident out block for column i.  k=0: the
    previous slab's HIGH planes (a in [T+M, T+2M]) land on x nodes
    [0, M]; k=1: the core (a in [M, M+T)); k=2: the next slab's LOW
    planes (a in [0, M)) land on x nodes [T-M, T-1]."""
    k = pl.program_id(1)

    def contribution(a0, na, xlo):
        # X[y] = (nty, T, nz) x-placed z-folded planes for this slab
        Xs = []
        for y in range(P):
            V = _zfold(lambda tz: t_ref[0, :, tz, a0:a0 + na,
                                        y * P:(y + 1) * P],
                       nty, na, ntz, T, M, P, nz)
            pads = []
            if xlo > 0:
                pads.append(jnp.zeros((nty, xlo, nz), jnp.float32))
            pads.append(V)
            if xlo + na < T:
                pads.append(jnp.zeros((nty, T - xlo - na, nz),
                                      jnp.float32))
            Xs.append(jnp.concatenate(pads, axis=1) if len(pads) > 1
                      else pads[0])
        # y-fold: node m of tile ty = X[m+M][ty] (+ prev tile's high
        # planes for m <= M, + next tile's low planes for m >= T-M)
        Os = []
        for m in range(T):
            O = Xs[m + M]
            if m <= M:
                O = O + pltpu.roll(Xs[T + M + m], 1, axis=0)
            if m >= T - M:
                O = O + pltpu.roll(Xs[m - (T - M)], nty - 1, axis=0)
            Os.append(O)
        return Os

    def emit(Os, first):
        for ty in range(nty):
            block = jnp.concatenate(
                [jax.lax.slice_in_dim(O, ty, ty + 1, axis=0)
                 for O in Os], axis=0)                   # (T m, T x, nz)
            if first:
                out_ref[pl.ds(ty * T, T)] = block
            else:
                out_ref[pl.ds(ty * T, T)] += block

    @pl.when(k == 0)
    def _():
        emit(contribution(T + M, M + 1, 0), first=True)

    @pl.when(k == 1)
    def _():
        emit(contribution(M, T, 0), first=False)

    @pl.when(k == 2)
    def _():
        emit(contribution(0, M, T - M) if M else
             [jnp.zeros((nty, T, nz), jnp.float32)] * T, first=False)


def fold_global_t(tiles: jax.Array, ts: TileSpec,
                  interpret: bool = False) -> jax.Array:
    """(NT, P, P*P) deposited tile blocks -> global charge density in
    (y, x, z) orientation — ``fold_to_global(...).transpose(1, 0, 2)``.

    The transposed orientation is deliberate: it is exactly what
    ``efield_tiles`` consumes (transposed=True), and for the FFT solver
    the axis order is irrelevant (build it on the permuted shape)."""
    assert ts.n_dims == 3
    T, M, P = ts.T, ts.M, ts.P
    ntx, nty, ntz = ts.ntiles
    nx, ny, nz = ts.grid
    assert T > 2 * M + 1, "fold kernel needs T > 2M+1 (non-overlapping tails)"
    t4 = tiles.reshape(ntx, nty, ntz, P, P * P)

    out = pl.pallas_call(
        partial(_fold_kernel, T=T, M=M, P=P, nty=nty, ntz=ntz, nz=nz),
        out_shape=jax.ShapeDtypeStruct((ny, nx, nz), jnp.float32),
        grid=(ntx, 3),
        in_specs=[pl.BlockSpec(
            (1, nty, ntz, P, P * P),
            lambda i, k: ((i + k - 1) % ntx, 0, 0, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ny, T, nz), lambda i, k: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(t4)
    return out


def efield_tiles_fits(ts: TileSpec) -> bool:
    """True when the padded-phi VMEM residency strategy fits comfortably
    (the whole transposed slab is kept on-chip across the program grid)."""
    if ts.n_dims != 3:
        return False
    nx, ny, nz = ts.grid
    bytes_in = (ny + 2 * ts.M + 3) * (nx + 2 * ts.M + 3) * nz * 4
    return bytes_in <= 10 * 1024 * 1024
