"""Exchange (sort-free) re-bucketing: selection-matmul kernels and the
per-dimension transfer driver."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinc_tpu.ops import pallas_rebucket as prb
from pinc_tpu.ops.tiled import (TileSpec, bucket, global_positions,
                                rebucket_exchange)


def test_extract_selects_rows():
    NT, B, K = 4, 256, 128
    rng = np.random.default_rng(0)
    pay = jnp.asarray(rng.normal(size=(NT, 8, B)).astype(np.float32))
    mask = rng.random((NT, B)) < 0.2
    rank = np.cumsum(mask, axis=1) - 1
    rank_i = jnp.asarray(np.where(mask & (rank < K), rank, -1).astype(np.int32))
    out = np.asarray(prb.extract(rank_i, pay, K, interpret=True))
    for t in range(NT):
        idx = np.flatnonzero(mask[t])[:K]
        assert np.allclose(out[t][:, :len(idx)], np.asarray(pay)[t][:, idx],
                           atol=1e-6)
        assert np.all(out[t][:, len(idx):] == 0.0)


def test_merge_places_rows():
    NT, B, K = 4, 256, 128
    rng = np.random.default_rng(1)
    buf = jnp.asarray(rng.normal(size=(NT, 8, K)).astype(np.float32))
    slot = np.full((NT, K), -1, np.int32)
    for t in range(NT):
        s = rng.choice(B, size=K // 2, replace=False)
        slot[t, :K // 2] = s
    out = np.asarray(prb.merge(jnp.asarray(slot), buf, B, interpret=True))
    for t in range(NT):
        for k in range(K // 2):
            assert np.allclose(out[t][:, slot[t, k]],
                               np.asarray(buf)[t][:, k], atol=1e-6)
    # untargeted slots are zero
    assert (np.abs(out).sum(axis=1) > 0).sum() == NT * (K // 2)


def test_exchange_rebucket_conserves():
    ts = TileSpec(grid=(16, 16, 16), T=4, M=1, B=128, chunk=8)
    rng = np.random.default_rng(0)
    n = 3000
    pos = rng.uniform(0, 16, (n, 3)).astype(np.float32)
    vel = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    alive[::11] = False
    lp, lv, la, _ = bucket(jnp.asarray(pos), jnp.asarray(vel),
                           jnp.asarray(alive), ts)
    drift = jnp.asarray(rng.uniform(-0.9, 0.9, lp.shape).astype(np.float32))
    lp2 = lp + drift * la[..., None]

    gp_b = np.asarray(global_positions(lp2, ts))[np.asarray(la)]
    lv_b = np.asarray(lv)[np.asarray(la)]
    lp3, lv3, la3, dropped = rebucket_exchange(lp2, lv, la, ts, K=128,
                                               interpret=True)
    assert int(dropped) == 0
    assert int(la3.sum()) == int(la.sum())
    l3 = np.asarray(lp3)[np.asarray(la3)]
    assert l3.min() >= 0.0 and l3.max() < ts.T
    # (pos, vel) pairing preserved as a multiset
    gp_a = np.asarray(global_positions(lp3, ts))[np.asarray(la3)]
    lv_a = np.asarray(lv3)[np.asarray(la3)]
    hb = np.sort((gp_b * 7.1).sum(1) + (lv_b * 13.3).sum(1))
    ha = np.sort((gp_a * 7.1).sum(1) + (lv_a * 13.3).sum(1))
    assert np.allclose(hb, ha, atol=1e-2)


def test_exchange_overflow_counted():
    """Tiny K forces drops, which must be counted not corrupted."""
    ts = TileSpec(grid=(8, 8, 8), T=4, M=1, B=128, chunk=8)
    rng = np.random.default_rng(2)
    n = 1000
    pos = rng.uniform(0, 8, (n, 3)).astype(np.float32)
    lp, lv, la, _ = bucket(jnp.asarray(pos), jnp.zeros((n, 3), jnp.float32),
                           jnp.ones(n, bool), ts)
    lp2 = lp + jnp.asarray(np.full(lp.shape, 0.9, np.float32)) * la[..., None]
    lp3, lv3, la3, dropped = rebucket_exchange(lp2, lv, la, ts, K=8,
                                               interpret=True)
    assert int(la3.sum()) + int(dropped) == int(la.sum())
    l3 = np.asarray(lp3)[np.asarray(la3)]
    assert l3.min() >= 0.0 and l3.max() < ts.T
