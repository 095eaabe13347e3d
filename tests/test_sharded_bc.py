"""Bounded (Dirichlet/Neumann) domains on the sharded path: must match
the single-device bounded simulation on the same deck."""

import numpy as np
import pytest

from pinc_tpu.config import PincConfig
from pinc_tpu.parallel.pic import ShardedSimulation
from pinc_tpu.simulation import Simulation


def _deck(nsub, bounds):
    return f"""
[time]
nTimeSteps = 3
timeStep = 0.1
[grid]
nDims = 3
nSubdomains = {','.join(map(str, nsub))}
trueSize = {','.join(str(16 // n) for n in nsub)}
stepSize = 1
boundaries = {bounds}
# homogeneous boundary values: the reference's defaults (1.0 Dirichlet /
# 2.0 Neumann) drive sheath fields strong enough to fling particles
# across >1 subdomain per step, which single-hop migration (like the
# reference's, guarded by pVelAssertMax) does not support
bndValues = 0,0,0,0,0,0
[population]
nSpecies = 2
nParticles = 2 pc
nAlloc = 6 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
# gentle dynamics: agreement is asserted over several steps, and a hot
# under-resolved deck amplifies f32 solver noise chaotically
thermalVelocity = 0.03,0.001
drift = 0.02
[methods]
mode = regular
poisson = mgSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
[multigrid]
mgLevels = 2
mgCycles = 8
nPreSmooth = 3
nPostSmooth = 3
nCoarseSolve = 12
"""


@pytest.mark.parametrize("bounds", [
    "DIRICHLET", "NEUMANN",
    "PERIODIC,PERIODIC,DIRICHLET,PERIODIC,PERIODIC,DIRICHLET",
])
def test_sharded_bounded_matches_single(cpu_devices, bounds):
    single = Simulation(PincConfig.from_string(_deck((1, 1, 1), bounds)),
                        seed=11)
    sharded = ShardedSimulation(
        PincConfig.from_string(_deck((2, 2, 2), bounds)), seed=11,
        devices=cpu_devices[:8])
    assert int(np.asarray(single.particles.counts()).sum()) == \
        int(np.asarray(sharded.particles.alive).sum())

    out1 = single._half_kick(single.particles)
    outN = sharded._half_kick_jit(sharded.particles)
    p1, pN = out1.particles, outN.particles
    for _ in range(3):
        out1 = single._step(p1)
        outN = sharded._step_jit(pN)
        p1, pN = out1.particles, outN.particles
        ke1 = float(np.asarray(out1.diag.kin_energy).sum())
        keN = float(np.asarray(outN.diag.kin_energy).sum())
        assert np.isclose(ke1, keN, rtol=1e-3), (bounds, ke1, keN)
        pe1 = float(out1.diag.pot_energy)
        peN = float(outN.diag.pot_energy)
        # atol covers the near-zero PE of a neutral plasma's first steps
        # (absolute values ~1e-8 are f32 cancellation noise)
        assert np.isclose(pe1, peN, rtol=1e-2, atol=1e-6), (bounds, pe1, peN)
    # particles stayed inside the walls on every rank
    cell = np.asarray(pN.cell)
    alive = np.asarray(pN.alive)
    assert cell[alive].min() >= 0
    assert cell[alive].max() <= 15
