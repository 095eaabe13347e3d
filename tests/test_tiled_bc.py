"""Bounded (Dirichlet/Neumann) domains on the tiled layout: wall
reflection on tile-local planes + BC-aware gradient must reproduce the
flat bounded simulation."""

import numpy as np
import pytest

from pinc_tpu.config import PincConfig
from pinc_tpu.simulation import Simulation
from pinc_tpu.tiled_sim import TiledSimulation


def _deck(layout, bounds):
    return f"""
[time]
nTimeSteps = 5
timeStep = 0.1
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = 16,16,16
stepSize = 1
boundaries = {bounds}
bndValues = 0,0,0,0,0,0
[population]
nSpecies = 2
nParticles = 4 pc
nAlloc = 4 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.06,0.002
drift = 0.03
[methods]
mode = regular
poisson = mgSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
layout = {layout}
[multigrid]
mgLevels = 2
mgCycles = 8
nPreSmooth = 3
nPostSmooth = 3
nCoarseSolve = 12
[tiles]
tileSize = 4
margin = 1
rebucketEvery = 2
"""


@pytest.mark.parametrize("bounds", ["DIRICHLET", "NEUMANN"])
def test_tiled_bounded_matches_flat(bounds):
    flat = Simulation(PincConfig.from_string(_deck("flat", bounds)),
                      seed=9)
    tiled = TiledSimulation(PincConfig.from_string(_deck("tiled", bounds)),
                            seed=9)
    hf = flat.run(progress_every=0)
    ht = tiled.run(progress_every=0)
    kf = hf["kinetic"].sum(axis=1)
    kt = ht["kinetic"].sum(axis=1)
    assert np.all(np.isfinite(kt))
    # same trajectory to f32 tolerance over the first steps
    assert np.allclose(kf[:4], kt[:4], rtol=2e-3), (kf[:4], kt[:4])
    pf = hf["potential"]
    pt = ht["potential"]
    assert np.allclose(pf[:4], pt[:4], rtol=2e-2, atol=1e-5)
    # particles never escaped the walls
    lp = np.asarray(tiled.state.lpos)
    la = np.asarray(tiled.state.alive) > 0.5
    from pinc_tpu.ops.tiled import tile_origins
    org = np.asarray(tile_origins(tiled.ts))            # (NT, D)
    for d in range(3):
        g = lp[:, d] + org[None, :, d, None]
        vals = g[la]
        assert vals.min() >= 0.0 and vals.max() <= 15.0 + 1e-5
