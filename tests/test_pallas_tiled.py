"""Pallas kernels vs the XLA tiled ops, in interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinc_tpu.ops import pallas_tiled as pt
from pinc_tpu.ops.tiled import (TileSpec, bucket, deposit_tiled,
                                gather_tiled, pad_tiles)


@pytest.fixture
def setup():
    ts = TileSpec(grid=(16, 16, 16), T=4, M=1, B=128, chunk=8)
    rng = np.random.default_rng(0)
    n = 3000
    pos = rng.uniform(0, 16, (n, 3)).astype(np.float32)
    alive = np.ones(n, bool)
    alive[::13] = False
    lp, _, la, _ = bucket(jnp.asarray(pos), jnp.zeros((n, 3), jnp.float32),
                          jnp.asarray(alive), ts)
    return ts, lp, la, rng


def test_pallas_deposit_matches_xla(setup):
    ts, lp, la, _ = setup
    rho_ref = np.asarray(deposit_tiled(lp, la, 1.3, ts))
    xyz = jnp.moveaxis(lp, -1, 0)
    rho_pl = np.asarray(pt.deposit_to_grid(xyz, la, 1.3, ts, interpret=True))
    assert np.abs(rho_ref - rho_pl).max() < 1e-5


def test_pallas_gather_matches_xla(setup):
    ts, lp, la, rng = setup
    E = jnp.asarray(rng.normal(size=(16, 16, 16, 3)).astype(np.float32))
    Ep = pad_tiles(E, ts)
    g_ref = np.asarray(gather_tiled(Ep, lp, ts))
    xyz = jnp.moveaxis(lp, -1, 0)
    g_pl = np.asarray(pt.gather(
        Ep.reshape(ts.NT, ts.P, ts.P, ts.P, 3), xyz, ts, interpret=True))
    g_pl = np.moveaxis(g_pl, 0, -1)
    mask = np.asarray(la)
    assert np.abs(g_ref - g_pl)[mask].max() < 1e-5


def test_layout_divides():
    from pinc_tpu.ops.pallas_tiled import _layout
    for b in (128, 768, 6144, 49152, 10240):
        bbc, gj = _layout(b)
        assert b == gj * 8 * bbc
        assert bbc % 2 == 0 or bbc == b // 8
    import pytest as _pt
    with _pt.raises(ValueError):
        _layout(12)
