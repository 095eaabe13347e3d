"""Normalization tests: the invariant for every scheme is that after
normalization, the species-0 plasma frequency in simulation units equals
time:timeStep (in 1/omega_p0), i.e.

    omega0^2 = n0_sim * q0_sim^2 / m0_sim = timeStep^2      (dt = eps0 = 1)

which is what makes the Langmuir decks oscillate at the right rate."""

import math

import pytest

from pinc_tpu.config import PincConfig, global_volume
from pinc_tpu.units import alloc_and_normalize

SEMI_SI_DECK = """
[time]
nTimeSteps = 45
timeStep = 0.2
[grid]
nDims=3
nSubdomains=1,2,2
trueSize=32,16,16
stepSize=0.005
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 64 pc
nAlloc = 96 pc
charge = -1,1
mass = 1,1836
density = 1e11,1e11
thermalVelocity = 123000,2872
drift = 0
[methods]
normalization = semiSI
"""

DIRECT_DECK = """
[time]
nTimeSteps = 150
timeStep = 0.2
[grid]
nDims=1
nSubdomains=1
trueSize=32
stepSize=6.28 tot
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 64 pc
nAlloc = 96 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
temperature = 0
drift = 0
"""


def _omega0_sq(cfg):
    ns = cfg.get_int("population:nspecies")
    q = cfg.get_double_arr("population:charge", ns)
    m = cfg.get_double_arr("population:mass", ns)
    n0 = cfg.get_double_arr("population:nparticles", ns)[0] / global_volume(cfg)
    return n0 * q[0] ** 2 / m[0]


def test_semi_si_plasma_frequency():
    cfg = PincConfig.from_string(SEMI_SI_DECK)
    units = alloc_and_normalize(cfg)
    assert _omega0_sq(cfg) == pytest.approx(0.2 ** 2, rel=1e-9)
    # hand-computed values (SURVEY protocol): q0_sim = 1 by construction,
    # m0_sim = 64 / 0.04 = 1600
    q = cfg.get_double_arr("population:charge", 2)
    m = cfg.get_double_arr("population:mass", 2)
    assert q[0] == pytest.approx(-1.0, rel=1e-9)
    assert q[1] == pytest.approx(1.0, rel=1e-9)
    assert m[0] == pytest.approx(1600.0, rel=1e-9)
    assert m[1] / m[0] == pytest.approx(1836.0, rel=1e-9)
    # superparticle weight = density*V_SI/N = 1e11 * (32^3*0.005^3) / (64*32^3)
    w_expect = 1e11 * (32 ** 3 * 0.005 ** 3) / (64 * 32 ** 3)
    assert units.weights[0] == pytest.approx(w_expect, rel=1e-9)
    # thermal velocity normalized to cells/step
    wpe = math.sqrt((1.60217733e-19) ** 2 * 1e11
                    / (8.854187817e-12 * 9.10938188e-31))
    dt = 0.2 / wpe
    vth = cfg.get_double_arr("population:thermalvelocity", 2)
    assert vth[0] == pytest.approx(123000 / (0.005 / dt), rel=1e-9)


def test_direct_plasma_frequency():
    cfg = PincConfig.from_string(DIRECT_DECK)
    alloc_and_normalize(cfg)
    assert _omega0_sq(cfg) == pytest.approx(0.2 ** 2, rel=1e-12)
    q = cfg.get_double_arr("population:charge", 2)
    m = cfg.get_double_arr("population:mass", 2)
    assert q[0] < 0 and q[1] > 0
    assert m[1] / m[0] == pytest.approx(1836.0, rel=1e-12)
    # charge/mass ratio preserved
    assert q[0] / m[0] == pytest.approx(-1.0, rel=1e-12)


def test_si_equals_semi_si():
    """Running the same physical deck through SI directly must give the
    same simulation-unit values as semiSI (semiSI just converts to SI
    first, src/units.c:159-189)."""
    cfg1 = PincConfig.from_string(SEMI_SI_DECK)
    alloc_and_normalize(cfg1)

    wpe = math.sqrt((1.60217733e-19) ** 2 * 1e11
                    / (8.854187817e-12 * 9.10938188e-31))
    si = SEMI_SI_DECK.replace("normalization = semiSI", "normalization = SI")
    si = si.replace("timeStep = 0.2", f"timeStep = {0.2 / wpe!r}")
    si = si.replace("charge = -1,1",
                    f"charge = {-1.60217733e-19!r},{1.60217733e-19!r}")
    si = si.replace("mass = 1,1836",
                    f"mass = {9.10938188e-31!r},{9.10938188e-31 * 1836!r}")
    cfg2 = PincConfig.from_string(si)
    alloc_and_normalize(cfg2)

    for key in ("population:charge", "population:mass",
                "population:thermalvelocity"):
        a = cfg1.get_double_arr(key, 2)
        b = cfg2.get_double_arr(key, 2)
        assert a == pytest.approx(b, rel=1e-9), key


def test_semi_si_requires_unit_species0():
    bad = SEMI_SI_DECK.replace("charge = -1,1", "charge = -2,1")
    with pytest.raises(ValueError):
        alloc_and_normalize(PincConfig.from_string(bad))
