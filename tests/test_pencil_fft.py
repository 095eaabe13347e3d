"""Distributed pencil FFT Poisson solver vs the replicated reference."""

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.parallel.mesh import make_mesh
from pinc_tpu.parallel.pencil_fft import PencilSpectralSolver
from pinc_tpu.solvers.spectral import SpectralSolver


def test_pencil_matches_replicated(cpu_devices):
    shape = (16, 16, 16)
    ctx = make_mesh((2, 2, 2), (8, 8, 8), devices=cpu_devices[:8])
    rng = np.random.default_rng(0)
    rho_h = rng.normal(size=shape).astype(np.float32)
    rho_h -= rho_h.mean()
    rho = jax.device_put(jnp.asarray(rho_h),
                         ctx.sharding(ctx.field_spec()))

    ref = SpectralSolver(shape)(jnp.asarray(rho_h))
    pencil = jax.jit(PencilSpectralSolver(shape, ctx))
    phi = pencil(rho)
    assert np.allclose(np.asarray(phi), np.asarray(ref),
                       rtol=1e-4, atol=1e-5)


def test_pencil_in_sharded_step(cpu_devices):
    """Opt-in pencil FFT inside the sharded simulation reproduces the
    replicated-FFT energies."""
    from pinc_tpu.config import PincConfig
    from pinc_tpu.parallel.pic import ShardedSimulation

    deck = """
[time]
nTimeSteps = 2
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 2,2,2
trueSize = 8,8,8
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 2 pc
nAlloc = 4 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.08,0.002
drift = 0
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
{extra}
"""
    kes = []
    for extra in ("", "[parallel]\npencilFFT = true"):
        sim = ShardedSimulation(
            PincConfig.from_string(deck.format(extra=extra)), seed=5,
            devices=cpu_devices[:8])
        out = sim._half_kick_jit(sim.particles)
        out = sim._step_jit(out.particles)
        kes.append(float(out.diag.kin_energy.sum()))
    assert np.isfinite(kes).all()
    assert abs(kes[0] - kes[1]) <= 1e-4 * max(abs(kes[0]), 1e-12)
