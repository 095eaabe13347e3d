"""Config/ini semantics tests — property-checks against the reference's
iniparser behavior (SURVEY.md §5 'Config / flag system')."""

import math

import pytest

from pinc_tpu.config import (PincConfig, global_size, global_volume,
                             parse_indirect_input, required_np)

DECK = """
; comment line
[time]
nTimeSteps = 45     ; trailing comment
timeStep = 0.2

[grid]
nDims=3
nSubdomains=1,2,2
trueSize=32,16,16
stepSize=0.005
boundaries = PERIODIC
nEmigrantsAlloc=1 pc, 2 pc, 4 pc

[population]
nSpecies = 2
nParticles = 64 pc
charge = -1,1
mass = 1,1836
thermalVelocity = 123000,2872
"""


@pytest.fixture
def cfg():
    return PincConfig.from_string(DECK)


def test_basic_getters(cfg):
    assert cfg.get_int("time:nTimeSteps") == 45
    assert cfg.get_double("time:timestep") == 0.2
    # case insensitivity (iniparser lowercases keys)
    assert cfg.get_int("GRID:NDIMS") == 3


def test_array_expansion(cfg):
    # cyclic repetition: {a,b} expanded to 5 -> {a,b,a,b,a}
    assert cfg.get_int_arr("grid:nsubdomains", 3) == [1, 2, 2]
    assert cfg.get_double_arr("population:charge", 4) == [-1, 1, -1, 1]
    # single value repeats
    assert cfg.get_double_arr("grid:stepsize", 3) == [0.005] * 3


def test_atof_ignores_suffix(cfg):
    assert cfg.get_double_arr("population:nparticles", 1) == [64.0]
    assert cfg.get_double_arr("grid:nemigrantsalloc", 3) == [1, 2, 4]


def test_global_size_and_np(cfg):
    assert global_size(cfg) == [32, 32, 32]
    assert global_volume(cfg) == 32768
    assert required_np(cfg) == 4


def test_indirect_input(cfg):
    parse_indirect_input(cfg)
    V = 32768
    assert cfg.get_double_arr("population:nparticles", 1) == [64.0 * V]
    assert cfg.get_double_arr("grid:nemigrantsalloc", 3) == [V, 2 * V, 4 * V]
    # stepSize has no 'tot' suffix -> unchanged
    assert cfg.get_double_arr("grid:stepsize", 3) == [0.005] * 3


def test_tot_suffix():
    cfg = PincConfig.from_string(
        "[grid]\nnDims=1\nnSubdomains=1\ntrueSize=32\n"
        "stepSize=6.28 tot\nboundaries=PERIODIC\n")
    parse_indirect_input(cfg)
    assert cfg.get_double_arr("grid:stepsize", 1) == [pytest.approx(6.28 / 32)]


def test_overrides():
    cfg = PincConfig.from_string(DECK)
    cfg2 = PincConfig.from_string(DECK)
    cfg2.set_str("grid:nsubdomains", "2,2,2")
    assert required_np(cfg) == 4
    assert required_np(cfg2) == 8


def test_scale_double(cfg):
    cfg.scale_double("population:thermalvelocity", 0.5)
    assert cfg.get_double_arr("population:thermalvelocity", 2) == [61500, 1436]


def test_missing_key_raises(cfg):
    from pinc_tpu.config import ConfigError
    with pytest.raises(ConfigError):
        cfg.get_str("grid:nonexistent")
    assert cfg.get_str("grid:nonexistent", "dflt") == "dflt"
