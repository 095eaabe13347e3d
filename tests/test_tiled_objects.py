"""Embedded objects on the tiled layout: absorption + capacitance
sequence must reproduce the flat single-device object run (bepiColombo-
class decks are periodic + objects, the tiled layout's home turf)."""

import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.objects import make_sphere, save_domain
from pinc_tpu.simulation import Simulation
from pinc_tpu.tiled_sim import TiledSimulation


def _deck(path, layout):
    L = 16
    return f"""
[objects]
objects = {path}
[time]
nTimeSteps = 6
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = {L},{L},{L}
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 8 pc
nAlloc = 8 pc
charge = -1,1
mass = 1,100
multiplicity = auto
thermalVelocity = 0.2,0.02
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
layout = {layout}
[tiles]
tileSize = 4
margin = 1
rebucketEvery = 3
"""


def test_tiled_objects_charging(tmp_path):
    dom = make_sphere((16,) * 3, (8, 8, 8), 2.5)
    path = str(tmp_path / "sphere.grid.h5")
    save_domain(path, dom)

    flat = Simulation(PincConfig.from_string(_deck(path, "flat")), seed=4)
    tiled = TiledSimulation(PincConfig.from_string(_deck(path, "tiled")),
                            seed=4)
    assert tiled.objects is not None

    hf = flat.run(progress_every=0)
    ht = tiled.run(progress_every=0)

    # identical absorption totals (same ICs, same physics)
    nf = int(np.asarray(flat.particles.counts()).sum())
    nt = int(np.asarray(tiled.particles.alive).sum())
    assert nf == nt, (nf, nt)
    # object charge and floating potential agree
    qf = float(np.asarray(flat.last_rho_obj).sum())
    qt = float(np.asarray(tiled.last_rho_obj).sum())
    assert np.isclose(qf, qt, rtol=1e-4, atol=1e-7), (qf, qt)
    assert qt < 0.0                             # electrons absorb faster
    assert np.isclose(float(flat.last_obj_potential[0]),
                      float(tiled.last_obj_potential[0]),
                      rtol=5e-3, atol=1e-6)
    # energy histories agree while both stay on the same trajectory
    kf = hf["kinetic"].sum(axis=1)
    kt = ht["kinetic"].sum(axis=1)
    assert np.allclose(kf[:4], kt[:4], rtol=2e-3)


def test_tiled_object_scan_matches_run(tmp_path):
    """The object scan driver reproduces run()'s energy series (same
    physics sequence, host loop removed)."""
    dom = make_sphere((16,) * 3, (8, 8, 8), 2.5)
    path = str(tmp_path / "sphere.grid.h5")
    save_domain(path, dom)

    sim_r = TiledSimulation(PincConfig.from_string(_deck(path, "tiled")),
                            seed=4)
    h = sim_r.run(progress_every=0)

    sim_s = TiledSimulation(PincConfig.from_string(_deck(path, "tiled")),
                            seed=4)
    # run() begins with the half-kick; mirror it before scanning
    st, rho, phi, E, diag = sim_s._thalf_obj_jit(sim_s.state)
    run_n = sim_s.make_scan_steps(6)
    (st, rho_obj), (ke, pe, dropped, obj_phi) = run_n(st)
    ke = np.asarray(ke).sum(axis=1)
    ref = h["kinetic"][1:].sum(axis=1)
    np.testing.assert_allclose(ke, ref, rtol=1e-4)
    assert np.isfinite(np.asarray(obj_phi)).all()
