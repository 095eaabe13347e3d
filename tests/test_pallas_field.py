"""efield_tiles == pad_tiles_cmajor(-gradient(phi)) (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinc_tpu.grid import gradient
from pinc_tpu.ops import tiled as tl
from pinc_tpu.ops.pallas_field import efield_tiles


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
