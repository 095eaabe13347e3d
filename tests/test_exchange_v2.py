"""Fused plane-based exchange re-bucketing (ops/pallas_exchange.py)."""

import jax.numpy as jnp
import numpy as np

from pinc_tpu.ops import pallas_exchange as pex
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


def test_exchange_v2_conserves():
    ts, lp2, lv, la = _setup((16, 16, 16), 4, 128, 3000, 0.9)
    gp_b = np.asarray(global_positions(lp2, ts))[np.asarray(la)]
    lv_b = np.asarray(lv)[np.asarray(la)]

    planes, al = _to_planes(lp2, lv, la)
    planes, al, dropped = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=64, interpret=True)
    lp3, lv3, la3 = _from_planes(planes, al)

    assert int(dropped) == 0
    assert int(la3.sum()) == int(la.sum())
    l3 = np.asarray(lp3)[np.asarray(la3)]
    assert l3.min() >= 0.0 and l3.max() < ts.T
    gp_a = np.asarray(global_positions(lp3, ts))[np.asarray(la3)]
    lv_a = np.asarray(lv3)[np.asarray(la3)]
    hb = np.sort((gp_b * 7.1).sum(1) + (lv_b * 13.3).sum(1))
    ha = np.sort((gp_a * 7.1).sum(1) + (lv_a * 13.3).sum(1))
    assert np.allclose(hb, ha, atol=1e-2)


def test_exchange_v2_overflow_counted():
    ts = TileSpec(grid=(8, 8, 8), T=4, M=1, B=128, chunk=8)
    rng = np.random.default_rng(2)
    n = 1000
    pos = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    lp, lv, la, _ = bucket(jnp.asarray(pos), jnp.zeros((n, 3), jnp.float32),
                           jnp.ones(n, bool), ts)
    lp2 = lp + jnp.asarray(np.full(lp.shape, 0.9, np.float32)) * la[..., None]
    planes, al = _to_planes(lp2, lv, la)
    planes, al, dropped = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=8, interpret=True)
    lp3, lv3, la3 = _from_planes(planes, al)
    assert int(la3.sum()) + int(dropped) == int(la.sum())
    l3 = np.asarray(lp3)[np.asarray(la3)]
    assert l3.min() >= 0.0 and l3.max() < ts.T


def test_exchange_matches_sort_rebucket():
    """The exchange path and a full sort re-bucket agree on the particle
    multiset (positions in the global frame + paired velocities)."""
    ts, lp2, lv, la = _setup((8, 8, 8), 4, 512, 2000, 0.9, seed=3)
    gpos = global_positions(lp2, ts).reshape(-1, 3)
    lp_s, lv_s, la_s, d1 = bucket(gpos, lv.reshape(-1, 3),
                                  la.reshape(-1), ts)
    planes, al = _to_planes(lp2, lv, la)
    planes, al, d2 = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=64, interpret=True)
    lp_v2, lv_v2, la_v2 = _from_planes(planes, al)
    assert int(d1) == int(d2) == 0
    assert int(la_s.sum()) == int(la_v2.sum())

    def multiset(lp, lv, la, ts):
        gp = np.asarray(global_positions(lp, ts))[np.asarray(la)]
        v = np.asarray(lv)[np.asarray(la)]
        return np.sort((gp * 7.1).sum(1) + (v * 13.3).sum(1))

    assert np.allclose(multiset(lp_s, lv_s, la_s, ts),
                       multiset(lp_v2, lv_v2, la_v2, ts), atol=1e-2)


def test_exchange_rows_matches_tile_path():
    """Per-row (v4) and per-tile (v3) kernels agree on the particle
    multiset when rows have head room (low occupancy)."""
    ts, lp2, lv, la = _setup((16, 16, 16), 4, 256, 3000, 0.9, seed=5)
    planes, al = _to_planes(lp2, lv, la)
    p_r, al_r, d_r = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=64, interpret=True, rows=True)
    p_t, al_t, d_t = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=64, interpret=True, rows=False)
    assert int(d_r) == int(d_t) == 0
    assert int(al_r.sum()) == int(al_t.sum())

    def mset(ps, a):
        m = np.asarray(a) > 0.5
        return np.sort(sum(np.asarray(p)[m] * w for p, w in
                           zip(ps, [7.1, 3.3, 5.5, 13.3, 1.7, 2.9])))

    np.testing.assert_allclose(mset(p_r, al_r), mset(p_t, al_t), atol=1e-2)
    lp3 = np.stack([np.asarray(p) for p in p_r[:3]], axis=-1)
    m = np.asarray(al_r) > 0.5
    assert lp3[m].min() >= 0.0 and lp3[m].max() < ts.T


def test_exchange_rows_overflow_counted():
    """Per-row caps drop loudly (conservation of alive + dropped)."""
    ts = TileSpec(grid=(8, 8, 8), T=4, M=1, B=64, chunk=8)
    rng = np.random.default_rng(7)
    n = 800
    pos = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    from pinc_tpu.ops.tiled import bucket
    lp, lv, la, _ = bucket(jnp.asarray(pos), jnp.zeros((n, 3), jnp.float32),
                           jnp.ones(n, bool), ts)
    lp2 = lp + jnp.asarray(np.full(lp.shape, 0.9, np.float32)) * la[..., None]
    planes, al = _to_planes(lp2, lv, la)
    planes, al, dropped = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=8, interpret=True, rows=True, ks=8)
    lp3, lv3, la3 = _from_planes(planes, al)
    assert int(la3.sum()) + int(dropped) == int(la.sum())
    l3 = np.asarray(lp3)[np.asarray(la3)]
    assert l3.min() >= 0.0 and l3.max() < ts.T


def test_exchange_fused_matches_perdim():
    """The v5 fused all-dims exchange and the sequential per-dim sweeps
    agree on the particle multiset, including diagonal/corner movers."""
    ts, lp2, lv, la = _setup((16, 16, 16), 4, 256, 3000, 1.5, seed=9)
    planes, al = _to_planes(lp2, lv, la)
    p_f, al_f, d_f = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=64, interpret=True, rows=True,
        fused=True)
    p_s, al_s, d_s = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=64, interpret=True, rows=True,
        fused=False)
    assert int(d_f) == int(d_s) == 0
    assert int(al_f.sum()) == int(al_s.sum())

    def mset(ps, a):
        m = np.asarray(a) > 0.5
        return np.sort(sum(np.asarray(p)[m] * w for p, w in
                           zip(ps, [7.1, 3.3, 5.5, 13.3, 1.7, 2.9])))

    np.testing.assert_allclose(mset(p_f, al_f), mset(p_s, al_s), atol=1e-2)
    lp3 = np.stack([np.asarray(p) for p in p_f[:3]], axis=-1)
    m = np.asarray(al_f) > 0.5
    assert lp3[m].min() >= 0.0 and lp3[m].max() < ts.T


def test_exchange_fused_corner_flow():
    """A hand-placed corner mover (out of range in all three dims) lands
    in the correct diagonal-neighbor tile with all frame shifts applied."""
    ts = TileSpec(grid=(16, 16, 16), T=4, M=1, B=64, chunk=8)
    NT = ts.NT
    lp = np.zeros((NT, 64, 3), np.float32)
    lv = np.zeros((NT, 64, 3), np.float32)
    la = np.zeros((NT, 64), bool)
    # tile (1, 2, 3) -> flat index; particle at local (-0.5, 4.25, -0.75)
    tid = (1 * 4 + 2) * 4 + 3
    la[tid, 5] = True
    lp[tid, 5] = [-0.5, 4.25, -0.75]
    lv[tid, 5] = [1.0, 2.0, 3.0]
    planes, al = _to_planes(jnp.asarray(lp), jnp.asarray(lv),
                            jnp.asarray(la))
    p_f, al_f, d_f = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=8, interpret=True, rows=True,
        fused=True)
    assert int(d_f) == 0
    al_np = np.asarray(al_f) > 0.5
    assert al_np.sum() == 1
    dst = int(np.flatnonzero(al_np.any(axis=1)))
    assert dst == ((0 * 4 + 3) * 4 + 2)        # tile (0, 3, 2)
    slot = int(np.flatnonzero(al_np[dst]))
    got = [float(np.asarray(p)[dst, slot]) for p in p_f]
    np.testing.assert_allclose(got[:3], [3.5, 0.25, 3.25], atol=1e-6)
    np.testing.assert_allclose(got[3:], [1.0, 2.0, 3.0], atol=1e-6)


def test_exchange_fused_overflow_counted():
    """Fused-path cap overflow drops loudly (alive + dropped conserved)."""
    ts = TileSpec(grid=(8, 8, 8), T=4, M=1, B=64, chunk=8)
    rng = np.random.default_rng(7)
    n = 800
    pos = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    lp, lv, la, _ = bucket(jnp.asarray(pos), jnp.zeros((n, 3), jnp.float32),
                           jnp.ones(n, bool), ts)
    lp2 = lp + jnp.asarray(np.full(lp.shape, 0.9, np.float32)) * la[..., None]
    planes, al = _to_planes(lp2, lv, la)
    planes, al, dropped = pex.rebucket_exchange_planes(
        planes, al, ts.ntiles, ts.T, K=8, interpret=True, rows=True,
        ks=8, fused=True)
    lp3, lv3, la3 = _from_planes(planes, al)
    assert int(la3.sum()) + int(dropped) == int(la.sum())
    l3 = np.asarray(lp3)[np.asarray(la3)]
    assert l3.min() >= 0.0 and l3.max() < ts.T
