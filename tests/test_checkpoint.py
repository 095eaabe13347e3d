"""Checkpoint/resume and benchmark run-mode tests."""

import numpy as np
import pytest

from pinc_tpu.config import PincConfig
from pinc_tpu.registry import RUN_MODES
from pinc_tpu.simulation import Simulation

DECK = """
[files]
output = {out}
checkpointEvery = 5
[time]
nTimeSteps = {steps}
timeStep = 0.2
[grid]
nDims = 1
nSubdomains = 1
trueSize = 32
stepSize = 6.28 tot
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 16 pc
nAlloc = 16 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
temperature = 0
perturbAmplitude = 0.001,0
perturbMode = 1,0
[methods]
mode = regular
poisson = sSolve
acc = puAccND1KE
distr = puDistrND1
migrate = puExtractEmigrantsND
"""


def test_resume_continues_trajectory(tmp_path):
    """A 20-step run must equal a 10-step run + checkpoint + 10-step
    resume, bitwise on the particle state."""
    out = f"{tmp_path}/a/"
    cfg_full = PincConfig.from_string(DECK.format(out=out + "full", steps=20))
    cfg_full.set_str("files:checkpointevery", "0")
    sim_full = Simulation(cfg_full)
    sim_full.run(progress_every=0)

    cfg_a = PincConfig.from_string(DECK.format(out=out + "part", steps=10))
    sim_a = Simulation(cfg_a)
    sim_a.run(progress_every=0)

    cfg_b = PincConfig.from_string(DECK.format(out=out + "part", steps=20))
    cfg_b.set_str("time:resume", "true")
    sim_b = Simulation(cfg_b)
    assert sim_b._resumed and sim_b.start_step == 10
    sim_b.run(progress_every=0)

    pos_full = np.asarray(sim_full.particles.pos())
    pos_b = np.asarray(sim_b.particles.pos())
    assert np.allclose(pos_full, pos_b, atol=1e-6)
    vel_full = np.asarray(sim_full.particles.vel)
    vel_b = np.asarray(sim_b.particles.vel)
    assert np.allclose(vel_full, vel_b, atol=1e-7)


def test_resume_without_checkpoint_warns(tmp_path):
    cfg = PincConfig.from_string(DECK.format(out=f"{tmp_path}/x/", steps=3))
    cfg.set_str("time:starttime", "5.0")
    sim = Simulation(cfg)          # warns, starts fresh
    assert not sim._resumed and sim.start_step == 0


def test_mg_mode(tmp_path):
    deck = DECK.format(out=f"{tmp_path}/mg/", steps=1) + """
[multigrid]
mgLevels = 3
mgCycles = 20
nPreSmooth = 4
nPostSmooth = 4
nCoarseSolve = 20
nRepetitions = 2
"""
    cfg = PincConfig.from_string(deck)
    run = RUN_MODES.select(cfg, "methods:mode", default="mgMode")
    # methods:mode is 'regular' in the deck; select mgMode explicitly
    cfg.set_str("methods:mode", "mgMode")
    run = RUN_MODES.select(cfg, "methods:mode")
    result = run()
    assert result["seconds"] > 0
    # rms_error is absolute; the 32-node sinusoid has phi amplitude
    # (L/2pi)^2 = 26, and the FD-vs-continuum discretization gap is
    # ~k^2/12 = 0.3% -> absolute rms ~ 0.06
    assert result["rms_error"] < 0.1
    import h5py
    with h5py.File(f"{tmp_path}/mg/timer.xy.h5") as f:
        assert f["time"].shape == (1, 2)
        assert f["cycles"][0, 1] == 20


def test_mg_error_scaling():
    deck = DECK.format(out="", steps=1).replace("output = \n", "") + """
[multigrid]
mgLevels = 3
mgCycles = 30
nPreSmooth = 4
nPostSmooth = 4
nCoarseSolve = 30
"""
    cfg = PincConfig.from_string(deck)
    cfg.set_str("methods:mode", "mgModeErrorScaling")
    cfg.set_str("grid:ndims", "3")
    cfg.set_str("grid:truesize", "32,32,32")
    cfg.set_str("grid:nsubdomains", "1,1,1")
    run = RUN_MODES.select(cfg, "methods:mode")
    result = run()
    assert result["order"] > 1.5, result
