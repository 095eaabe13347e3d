"""Gather-based exchange kernels (ops/pallas_gather_exchange.py, v6).

The v6 path requires B % 1024 == 0 (whole-vreg rows); these fixtures use
B = 1024 so the auto-dispatch in rebucket_exchange_planes selects it.
All runs in interpret mode (CPU), where take_along_axis is exact."""

import jax.numpy as jnp
import numpy as np

from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.ops import pallas_gather_exchange as pgx
from pinc_tpu.ops.tiled import TileSpec, bucket, global_positions


def _to_planes(lp, lv, la):
    planes = tuple(lp[..., d] for d in range(3)) + tuple(
        lv[..., d] for d in range(3))
    return planes, la.astype(jnp.float32)


def _from_planes(planes, alive):
    lp = jnp.stack(planes[:3], axis=-1)
    lv = jnp.stack(planes[3:], axis=-1)
    return lp, lv, alive > 0.5


def _setup(grid, T, B, n, drift_scale, seed=0):
    ts = TileSpec(grid=grid, T=T, M=1, B=B, chunk=8)
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, grid[0], (n, 3)).astype(np.float32)
    vel = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    alive[::11] = False
    lp, lv, la, _ = bucket(jnp.asarray(pos), jnp.asarray(vel),
                           jnp.asarray(alive), ts)
    drift = jnp.asarray(
        rng.uniform(-drift_scale, drift_scale, lp.shape).astype(np.float32))
    lp2 = lp + drift * la[..., None]
    return ts, lp2, lv, la


def _vel_multiset(ps, a):
    """Velocity rows are never frame-shifted: they must survive the
    exchange BITWISE; return them as sorted byte rows."""
    m = np.asarray(a) > 0.5
    v = np.stack([np.asarray(p)[m] for p in ps[3:]], axis=1)
    view = v.view(np.uint32)
    order = np.lexsort(view.T[::-1])
    return view[order]


def _pos_multiset(ps, a, ts):
    m = np.asarray(a) > 0.5
    lp = jnp.stack(ps[:3], axis=-1)
    gp = np.asarray(global_positions(lp, ts))[np.asarray(a) > 0.5]
    return np.sort(gp, axis=0)


def test_gather_auto_dispatch():
    """B % 1024 == 0 + rows routes to the gather kernels by default."""
    assert pgx.supported(1024) and not pgx.supported(512)
    assert pgx.round_cap(8) == 128 and pgx.round_cap(129) == 256


def test_gather_fused_matches_onehot():
    """Gather (v6) and one-hot (v5) fused exchanges agree on the global
    particle multiset; velocities bitwise."""
    ts, lp2, lv, la = _setup((8, 8, 8), 4, 1024, 6000, 1.5, seed=3)
    planes, al = _to_planes(lp2, lv, la)
    p_g, al_g, d_g = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=256, interpret=True, rows=True,
        fused=True, impl="gather")
    p_o, al_o, d_o = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=256, interpret=True, rows=True,
        fused=True, impl="onehot", ks=128)
    assert int(d_g) == int(d_o) == 0
    assert int(al_g.sum()) == int(al_o.sum())
    np.testing.assert_array_equal(_vel_multiset(p_g, al_g),
                                  _vel_multiset(p_o, al_o))
    np.testing.assert_allclose(_pos_multiset(p_g, al_g, ts),
                               _pos_multiset(p_o, al_o, ts), atol=1e-5)
    lp3 = np.stack([np.asarray(p) for p in p_g[:3]], axis=-1)
    m = np.asarray(al_g) > 0.5
    assert lp3[m].min() >= 0.0 and lp3[m].max() < ts.T


def test_gather_perdim_matches_onehot():
    ts, lp2, lv, la = _setup((8, 8, 8), 4, 1024, 6000, 0.9, seed=5)
    planes, al = _to_planes(lp2, lv, la)
    p_g, al_g, d_g = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=256, interpret=True, rows=True,
        fused=False, impl="gather")
    p_o, al_o, d_o = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=256, interpret=True, rows=True,
        fused=False, impl="onehot", ks=128)
    assert int(d_g) == int(d_o) == 0
    assert int(al_g.sum()) == int(al_o.sum())
    np.testing.assert_array_equal(_vel_multiset(p_g, al_g),
                                  _vel_multiset(p_o, al_o))


def test_gather_corner_flow():
    """A corner mover (out of range in all three dims) lands in the
    correct diagonal-neighbor tile with all frame shifts applied."""
    ts = TileSpec(grid=(16, 16, 16), T=4, M=1, B=1024, chunk=8)
    NT = ts.NT
    lp = np.zeros((NT, 1024, 3), np.float32)
    lv = np.zeros((NT, 1024, 3), np.float32)
    la = np.zeros((NT, 1024), bool)
    tid = (1 * 4 + 2) * 4 + 3
    la[tid, 5] = True
    lp[tid, 5] = [-0.5, 4.25, -0.75]
    lv[tid, 5] = [1.0, 2.0, 3.0]
    planes, al = _to_planes(jnp.asarray(lp), jnp.asarray(lv),
                            jnp.asarray(la))
    p_f, al_f, d_f = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=128, interpret=True, rows=True,
        fused=True, impl="gather")
    assert int(d_f) == 0
    al_np = np.asarray(al_f) > 0.5
    assert al_np.sum() == 1
    dst = int(np.flatnonzero(al_np.any(axis=1))[0])
    assert dst == ((0 * 4 + 3) * 4 + 2)        # tile (0, 3, 2)
    slot = int(np.flatnonzero(al_np[dst])[0])
    got = [float(np.asarray(p)[dst, slot]) for p in p_f]
    np.testing.assert_allclose(got[:3], [3.5, 0.25, 3.25], atol=1e-6)
    np.testing.assert_allclose(got[3:], [1.0, 2.0, 3.0], atol=1e-6)


def test_gather_overflow_counted():
    """Cap overflow drops loudly (alive + dropped conserved) on the
    gather path: shove most of a dense tile through one face with the
    minimum cap."""
    ts = TileSpec(grid=(8, 8, 8), T=4, M=1, B=2048, chunk=8)
    rng = np.random.default_rng(7)
    n = 14000                     # ~1750/tile -> ~190 leavers/row > Ks=128
    pos = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    lp, lv, la, _ = bucket(jnp.asarray(pos), jnp.zeros((n, 3), jnp.float32),
                           jnp.ones(n, bool), ts)
    # push most of every row out through +x (in-envelope: local x stays
    # within one tile hop); leavers/row exceed the 128-lane face cap ->
    # extract overflow drops; conservation must still hold
    lp2 = lp.at[..., 0].add(jnp.where(la, 3.5, 0.0))
    planes, al = _to_planes(lp2, lv, la)
    planes, al, dropped = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=128, interpret=True, rows=True,
        fused=True, impl="gather")
    lp3, lv3, la3 = _from_planes(planes, al)
    assert int(la3.sum()) + int(dropped) == int(la.sum())
    l3 = np.asarray(lp3)[np.asarray(la3)]
    if l3.size:
        assert l3.min() >= 0.0 and l3.max() < ts.T


def test_gather_extract_kernel_direct():
    """Direct kernel check: compacted buffers hold exactly the leavers,
    in lane order, payload bitwise."""
    rng = np.random.default_rng(1)
    NT, B, T, Ks = 4, 2048, 8, 128
    alive = (rng.uniform(size=(NT, B)) < 0.8).astype(np.float32)
    planes = [rng.uniform(-1.5, T + 1.5, (NT, B)).astype(np.float32)
              for _ in range(3)]
    planes += [rng.normal(size=(NT, B)).astype(np.float32)
               for _ in range(3)]
    jp = tuple(jnp.asarray(p) for p in planes)
    bufs, alive2 = pgx.extract_rows_g(0, jnp.asarray(alive), jp, Ks, T,
                                      interpret=True)
    bufs = np.asarray(bufs)                    # (NT, 7, 8, 2Ks)
    L = B // 8
    for t in range(NT):
        a = alive[t].reshape(8, L) > 0.5
        x = planes[0][t].reshape(8, L)
        vx = planes[3][t].reshape(8, L)
        for r in range(8):
            lanes = np.nonzero(a[r] & (x[r] < 0))[0][:Ks]
            got = bufs[t, 3, r, :len(lanes)]
            np.testing.assert_array_equal(got, vx[r, lanes])
            assert np.all(bufs[t, 6, r, :len(lanes)] == 1.0)
            assert np.all(bufs[t, 6, r, len(lanes):Ks] == 0.0)
            lanes_p = np.nonzero(a[r] & (x[r] >= T))[0][:Ks]
            got_p = bufs[t, 3, r, Ks:Ks + len(lanes_p)]
            np.testing.assert_array_equal(got_p, vx[r, lanes_p])
    # killed: every leaver dead in alive2
    a2 = np.asarray(alive2)
    for t in range(NT):
        x = planes[0][t]
        leav = (alive[t] > 0.5) & ((x < 0) | (x >= T))
        assert np.all(a2[t][leav] == 0.0)
        stay = (alive[t] > 0.5) & ~leav
        assert np.all(a2[t][stay] == 1.0)


def test_gather_merge_row_spill():
    """A destination row with ZERO free slots must spill its arrivals
    into the tile's other rows (tile-wide free pool), not drop them.
    Rows 0..6 of the receiving tile are packed full; 100 arrivals
    target row 0's lane range and must land in row 7."""
    ts = TileSpec(grid=(8, 4, 4), T=4, B=1024, M=1, chunk=8)
    NT, B, L = ts.NT, 1024, 128
    lp = np.full((NT, B, 3), 1.5, np.float32)
    lv = np.zeros((NT, B, 3), np.float32)
    la = np.zeros((NT, B), bool)
    src, dst = 0, ts.NT // 2                 # +x neighbor of tile 0
    # receiving tile: rows 0..6 fully alive, row 7 empty
    la[dst, : 7 * L] = True
    lv[dst, : 7 * L, 0] = 7.0                # stayer marker
    # source tile: 100 leavers through +x, parked on row 0 lanes
    la[src, :100] = True
    lp[src, :100, 0] = 4.25                  # x >= T -> +x leaver
    lv[src, :100, 1] = np.arange(100, dtype=np.float32) + 1000.0
    planes, al = _to_planes(jnp.asarray(lp), jnp.asarray(lv),
                            jnp.asarray(la))
    n0 = int(al.sum())
    p_g, al_g, d_g = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=256, interpret=True, rows=True,
        fused=True, impl="gather")
    assert int(d_g) == 0
    assert int(al_g.sum()) == n0
    a2 = np.asarray(al_g).reshape(NT, 8, L) > 0.5
    # all 100 arrivals landed in the dst tile, necessarily beyond row 0
    assert a2[dst].sum() == 7 * L + 100
    assert a2[dst, 7].sum() == 100
    vy = np.asarray(p_g[4]).reshape(NT, 8, L)
    got = np.sort(vy[dst, 7][a2[dst, 7]])
    np.testing.assert_array_equal(got,
                                  np.arange(100, dtype=np.float32) + 1000.0)
    # positions frame-shifted into [0, T)
    x2 = np.asarray(p_g[0]).reshape(NT, 8, L)
    np.testing.assert_allclose(x2[dst, 7][a2[dst, 7]], 0.25, atol=1e-6)


def test_gather_merge_tile_full_drops_counted():
    """When the whole receiving tile is full, arrivals are dropped and
    counted exactly (alive + dropped conserved) — the spill passes must
    not invent slots or double-place."""
    ts = TileSpec(grid=(8, 4, 4), T=4, B=1024, M=1, chunk=8)
    NT, B = ts.NT, 1024
    lp = np.full((NT, B, 3), 1.5, np.float32)
    lv = np.zeros((NT, B, 3), np.float32)
    la = np.zeros((NT, B), bool)
    src, dst = 0, ts.NT // 2
    la[dst, :] = True                        # completely full
    la[src, :50] = True
    lp[src, :50, 0] = 4.25
    planes, al = _to_planes(jnp.asarray(lp), jnp.asarray(lv),
                            jnp.asarray(la))
    n0 = int(al.sum())
    p_g, al_g, d_g = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=256, interpret=True, rows=True,
        fused=True, impl="gather")
    assert int(d_g) == 50
    assert int(al_g.sum()) + int(d_g) == n0


def test_gather_merge_spill_multiset():
    """Random dense state with deliberately imbalanced row occupancy:
    gather (with spill) preserves the global particle multiset exactly
    where row-bound placement would drop."""
    ts, lp2, lv, la = _setup((8, 8, 8), 4, 1024, 6000, 1.5, seed=11)
    # pack: move every particle to the lowest free slots of its tile so
    # free slots concentrate on high rows (worst case for row binding)
    order = np.argsort(~np.asarray(la), axis=1, kind="stable")
    lp2 = jnp.take_along_axis(lp2, jnp.asarray(order)[..., None], axis=1)
    lv = jnp.take_along_axis(lv, jnp.asarray(order)[..., None], axis=1)
    la = jnp.take_along_axis(la, jnp.asarray(order), axis=1)
    planes, al = _to_planes(lp2, lv, la)
    p_g, al_g, d_g = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=256, interpret=True, rows=True,
        fused=True, impl="gather")
    assert int(d_g) == 0
    assert int(al_g.sum()) == int(al.sum())
    np.testing.assert_array_equal(_vel_multiset(p_g, al_g),
                                  _vel_multiset(planes, al))
