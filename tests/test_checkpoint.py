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


TILED_DECK = """
[files]
output = {out}
checkpointEvery = {ck}
[time]
nTimeSteps = {steps}
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = {nsub}
trueSize = 16,16,16
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 8 pc
nAlloc = 8 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.1,0.01
perturbAmplitude = 0.01,0,0,0,0,0
perturbMode = 1,0,0,0,0,0
[methods]
mode = regular
layout = tiled
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
[tiles]
tileSize = 4
margin = 2
rebucketEvery = 5
"""


def _tiled_cfg(out, steps, ck=0, nsub="1,1,1"):
    return PincConfig.from_string(
        TILED_DECK.format(out=out, steps=steps, ck=ck, nsub=nsub))


def test_tiled_resume_bitwise(tmp_path):
    """Kill-and-resume on the tiled production path continues the
    trajectory BITWISE (VERDICT item 5 acceptance): the checkpoint stores
    the (S, D, NT, B) tile planes verbatim, so no re-bucketing perturbs
    the deposit summation order."""
    from pinc_tpu.tiled_sim import TiledSimulation

    out = f"{tmp_path}/t/"
    sim_full = TiledSimulation(_tiled_cfg(out + "full", steps=10), seed=3)
    sim_full.run(progress_every=0)

    sim_a = TiledSimulation(_tiled_cfg(out + "part", steps=5, ck=5), seed=3)
    sim_a.run(progress_every=0)

    cfg_b = _tiled_cfg(out + "part", steps=10, ck=5)
    cfg_b.set_str("time:resume", "true")
    sim_b = TiledSimulation(cfg_b, seed=3)
    assert sim_b._resumed and sim_b.start_step == 5
    hist = sim_b.run(progress_every=0)
    assert hist["kinetic"].shape[0] == 5     # steps 6..10 only, no re-kick

    assert np.array_equal(np.asarray(sim_full.state.lpos),
                          np.asarray(sim_b.state.lpos))
    assert np.array_equal(np.asarray(sim_full.state.vel),
                          np.asarray(sim_b.state.vel))
    assert np.array_equal(np.asarray(sim_full.state.alive),
                          np.asarray(sim_b.state.alive))


def test_tiled_layout_mismatch_raises(tmp_path):
    """A flat Simulation must refuse a tiled-layout checkpoint instead of
    misreading it."""
    from pinc_tpu.tiled_sim import TiledSimulation

    out = f"{tmp_path}/m/"
    sim = TiledSimulation(_tiled_cfg(out, steps=2, ck=2), seed=1)
    sim.run(progress_every=0)
    cfg = PincConfig.from_string(DECK.format(out=out, steps=4))
    cfg.set_str("time:resume", "true")
    cfg.set_str("files:checkpointevery", "0")
    with pytest.raises(ValueError, match="tiled"):
        Simulation(cfg)


def test_sharded_tiled_resume(tmp_path, cpu_devices):
    """Resume works on the sharded-tiled path too: run() is inherited and
    the checkpoint round-trips through the flat (S, D, NT, B) axes."""
    from pinc_tpu.parallel.tiled_pic import ShardedTiledSimulation

    out = f"{tmp_path}/s/"
    sim_full = ShardedTiledSimulation(
        _tiled_cfg(out + "full", steps=8, nsub="2,1,1"), seed=3)
    sim_full.run(progress_every=0)

    sim_a = ShardedTiledSimulation(
        _tiled_cfg(out + "part", steps=4, ck=4, nsub="2,1,1"), seed=3)
    sim_a.run(progress_every=0)

    cfg_b = _tiled_cfg(out + "part", steps=8, ck=4, nsub="2,1,1")
    cfg_b.set_str("time:resume", "true")
    sim_b = ShardedTiledSimulation(cfg_b, seed=3)
    assert sim_b._resumed and sim_b.start_step == 4
    sim_b.run(progress_every=0)

    np.testing.assert_allclose(np.asarray(sim_full.state.lpos),
                               np.asarray(sim_b.state.lpos), atol=0)
    np.testing.assert_allclose(np.asarray(sim_full.state.vel),
                               np.asarray(sim_b.state.vel), atol=0)


def test_tiled_debug_guards(tmp_path):
    """methods:debug invariant checks run on the tiled path and pass on a
    healthy deck; a poisoned velocity trips pVelAssertMax."""
    from pinc_tpu.tiled_sim import TiledSimulation, TiledState
    from pinc_tpu.utils.logging import PincError

    cfg = _tiled_cfg(f"{tmp_path}/d/", steps=3)
    cfg.set_str("methods:debug", "true")
    cfg.set_str("population:maxvel", "10.0")
    sim = TiledSimulation(cfg, seed=2)
    sim.run(progress_every=0)       # healthy: no raise

    import jax.numpy as jnp
    st = sim.state
    bad_vel = np.asarray(st.vel).copy()
    bad_vel[0, 0, 0, 0] = 99.0
    bad = TiledState(lpos=st.lpos, vel=jnp.asarray(bad_vel),
                     alive=st.alive.at[0, 0, 0].set(1.0))
    with pytest.raises(PincError):
        sim._assert_invariants_tiled(bad, np.zeros((16, 16, 16)), 1, 10.0)


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
        # the MEASURED solve-to-tolerance count (src/multigrid.c:1998-2004),
        # not the mgCycles cap
        cycles = f["cycles"][0, 1]
        assert 0 < cycles <= 20
        assert cycles == result["cycles"]


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
