"""efield_tiles == pad_tiles_cmajor(-gradient(phi)) and
fold_global_t == fold_to_global(...).T (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinc_tpu.grid import gradient
from pinc_tpu.ops import tiled as tl
from pinc_tpu.ops.pallas_field import efield_tiles, fold_global_t


@pytest.mark.parametrize("M", [1, 2])
@pytest.mark.parametrize("shape", [(16, 16, 16), (16, 24, 32)])
def test_efield_tiles_matches_xla(shape, M):
    ts = tl.TileSpec(grid=shape, T=8, M=M, B=128)
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    P = ts.P
    want = tl.pad_tiles_cmajor(-gradient(phi), ts).reshape(
        ts.NT, 3 * P, P * P)
    got = efield_tiles(phi, ts, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("M", [1, 2])
@pytest.mark.parametrize("shape", [(16, 16, 16), (16, 24, 32)])
def test_fold_global_t_matches_xla(shape, M):
    if M == 2 and 8 <= 2 * M + 1:
        pytest.skip("T=8 needs T > 2M+1")
    ts = tl.TileSpec(grid=shape, T=8, M=M, B=128)
    rng = np.random.default_rng(1)
    tiles = jnp.asarray(
        rng.normal(size=(ts.NT, ts.P, ts.P * ts.P)).astype(np.float32))
    want = np.transpose(np.asarray(tl.fold_to_global(
        tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)), (1, 0, 2))
    got = np.asarray(fold_global_t(tiles, ts, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)
