"""Embedded objects on the sharded path: absorption, surface charging,
and the capacitance correction must match the single-device run."""

import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.objects import make_sphere, save_domain
from pinc_tpu.parallel.pic import ShardedSimulation
from pinc_tpu.simulation import Simulation


def _deck(nsub, path):
    L = 16
    return f"""
[objects]
objects = {path}
[time]
nTimeSteps = 6
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = {','.join(map(str, nsub))}
trueSize = {','.join(str(L // n) for n in nsub)}
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 8 pc
nAlloc = 16 pc
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
"""


def test_sharded_objects_match_single(cpu_devices, tmp_path):
    dom = make_sphere((16,) * 3, (8, 8, 8), 2.5)
    path = str(tmp_path / "sphere.grid.h5")
    save_domain(path, dom)

    s1 = Simulation(PincConfig.from_string(_deck((1, 1, 1), path)), seed=4)
    sN = ShardedSimulation(PincConfig.from_string(_deck((2, 2, 2), path)),
                           seed=4, devices=cpu_devices[:8])
    assert sN.objects is not None

    o1 = s1._half_kick(s1.particles)
    oN = sN._half_kick_jit(sN.particles)
    p1, pN = o1.particles, oN.particles
    r1 = s1.rho_obj
    rN = sN.rho_obj
    for n in range(4):
        o1 = s1._step(p1, r1)
        oN = sN._step_jit(pN, rN)
        p1, pN, r1, rN = o1.particles, oN.particles, o1.rho_obj, oN.rho_obj
        n1 = int(np.asarray(p1.alive).sum())
        nN = int(np.asarray(pN.alive).sum())
        assert n1 == nN, (n, n1, nN)          # identical absorption
        ke1 = float(np.asarray(o1.diag.kin_energy).sum())
        keN = float(np.asarray(oN.diag.kin_energy).sum())
        assert np.isclose(ke1, keN, rtol=2e-3), (n, ke1, keN)
        qo1 = float(np.asarray(r1).sum())
        qoN = float(np.asarray(rN).sum())
        assert np.isclose(qo1, qoN, rtol=1e-4, atol=1e-7), (n, qo1, qoN)
        assert np.isclose(float(o1.obj_potential[0]),
                          float(oN.obj_potential[0]),
                          rtol=5e-3, atol=1e-6), n
    # physics: mobile electrons absorbed faster -> negative charging
    assert float(np.asarray(rN).sum()) < 0.0
