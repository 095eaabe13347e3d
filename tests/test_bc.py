"""Boundary-condition tests: Dirichlet/Neumann pads, BC-aware multigrid
against analytic solutions (the reference's gBnd semantics,
src/grid.c:922-1023), and a bounded end-to-end run."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinc_tpu.bc import (BCSpec, clamp_dirichlet, gradient_bc,
                         laplacian_bc, pad_bc)
from pinc_tpu.config import PincConfig
from pinc_tpu.grid import BndType
from pinc_tpu.ops import pusher
from pinc_tpu.simulation import Simulation
from pinc_tpu.solvers.multigrid import MultigridSolver

D = BndType.DIRICHLET
N = BndType.NEUMANN
P = BndType.PERIODIC


def bc1d(lo, hi, vlo=0.0, vhi=0.0):
    return BCSpec(lower=(lo,), upper=(hi,), lower_value=(vlo,),
                  upper_value=(vhi,))


def test_pad_periodic_wraps():
    bc = bc1d(P, P)
    x = jnp.asarray([1.0, 2.0, 3.0])
    p = np.asarray(pad_bc(x, bc))
    assert np.allclose(p, [3, 1, 2, 3, 1])


def test_pad_neumann_ghost():
    """ghost = phi[1] - 2A: the centered derivative across node 0 equals A
    (gNeumann, src/grid.c:1007-1013)."""
    bc = bc1d(N, N, vlo=1.5, vhi=0.5)
    x = jnp.asarray([10.0, 20.0, 30.0])
    p = np.asarray(pad_bc(x, bc))
    assert p[0] == pytest.approx(20.0 - 3.0)   # phi[1] - 2*1.5
    assert p[-1] == pytest.approx(20.0 - 1.0)  # phi[-2] - 2*0.5
    assert (p[2] - p[0]) / 2 == pytest.approx(1.5)


def test_clamp_dirichlet():
    bc = bc1d(D, D, vlo=7.0, vhi=-3.0)
    x = jnp.zeros(5)
    out = np.asarray(clamp_dirichlet(x, bc))
    assert out[0] == 7.0 and out[-1] == -3.0 and np.all(out[1:-1] == 0)


def test_gradient_bc_matches_interior():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 12)).astype(np.float32))
    bc = BCSpec(lower=(D, P), upper=(D, P), lower_value=(0.0, 0.0),
                upper_value=(0.0, 0.0))
    g = np.asarray(gradient_bc(x, bc))
    xn = np.asarray(x)
    interior = 0.5 * (xn[2:, :] - xn[:-2, :])
    assert np.allclose(g[1:-1, :, 0], interior, atol=1e-6)
    wrap = 0.5 * (np.roll(xn, -1, 1) - np.roll(xn, 1, 1))
    assert np.allclose(g[:, :, 1], wrap, atol=1e-6)


def test_mg_dirichlet_sine():
    """Discrete eigenfunction of the Dirichlet Laplacian: sin(pi x/(L-1)),
    solved to the f32 floor."""
    L = 32
    x = np.arange(L, dtype=np.float64)
    k = np.pi / (L - 1)
    phi_exact = np.sin(k * x)
    rho = 4 * np.sin(k / 2) ** 2 * phi_exact
    mg = MultigridSolver((L,), n_levels=3, n_pre=4, n_post=4, n_coarse=40,
                         max_cycles=50, tol=1e-7, bc=bc1d(D, D))
    phi = np.asarray(mg(jnp.asarray(rho, jnp.float32)))
    assert phi[0] == 0.0 and phi[-1] == 0.0
    assert np.abs(phi - phi_exact).max() < 5e-4


def test_mg_inhomogeneous_dirichlet_linear():
    """rho=0 with phi(0)=2, phi(L-1)=5 has the exact linear solution."""
    L = 32
    mg = MultigridSolver((L,), n_levels=3, n_pre=4, n_post=4, n_coarse=40,
                         max_cycles=60, tol=1e-8, bc=bc1d(D, D, 2.0, 5.0))
    phi = np.asarray(mg(jnp.zeros(L, jnp.float32)))
    lin = 2.0 + 3.0 * np.arange(L) / (L - 1)
    assert np.abs(phi - lin).max() < 1e-3


def test_mg_neumann_ramp():
    """Neumann derivative A at the lower wall + grounded upper wall:
    phi = x - (L-1)."""
    L = 32
    mg = MultigridSolver((L,), n_levels=2, n_pre=6, n_post=6, n_coarse=60,
                         max_cycles=80, tol=1e-8, bc=bc1d(N, D, 1.0, 0.0))
    phi = np.asarray(mg(jnp.zeros(L, jnp.float32)))
    expect = np.arange(L, dtype=np.float64) - (L - 1)
    assert np.abs(phi - expect).max() < 5e-3


def test_mg_dirichlet_3d():
    L = 16
    x = np.arange(L, dtype=np.float64)
    k = np.pi / (L - 1)
    s = np.sin(k * x)
    phi_exact = s[:, None, None] * s[None, :, None] * s[None, None, :]
    lam = 3 * 4 * np.sin(k / 2) ** 2
    rho = lam * phi_exact
    bc = BCSpec(lower=(D,) * 3, upper=(D,) * 3, lower_value=(0.0,) * 3,
                upper_value=(0.0,) * 3)
    mg = MultigridSolver((L,) * 3, n_levels=3, n_pre=4, n_post=4,
                         n_coarse=40, max_cycles=40, tol=1e-7, bc=bc)
    phi = np.asarray(mg(jnp.asarray(rho, jnp.float32)))
    assert np.abs(phi - phi_exact).max() < 5e-3


def test_reflect_walls():
    from tests.test_pusher import make_particles
    p = make_particles([[[30.6]]], [[[1.0]]])
    p = pusher.move(p, (32,), periodic=False)   # -> 31.6, beyond wall at 31
    p = pusher.reflect(p, (32,))
    pos = float(np.asarray(p.pos())[0, 0, 0])
    assert pos == pytest.approx(2 * 31 - 31.6, abs=1e-5)
    assert float(p.vel[0, 0, 0]) == -1.0

    p2 = make_particles([[[0.2]]], [[[-0.5]]])
    p2 = pusher.move(p2, (32,), periodic=False)
    p2 = pusher.reflect(p2, (32,))
    assert float(np.asarray(p2.pos())[0, 0, 0]) == pytest.approx(0.3, abs=1e-5)
    assert float(p2.vel[0, 0, 0]) == 0.5


def test_bounded_simulation_runs():
    """End-to-end bounded (all-Dirichlet) deck: runs, conserves particles,
    keeps them inside the walls."""
    deck = """
[time]
nTimeSteps = 15
timeStep = 0.2
[grid]
nDims = 1
nSubdomains = 1
trueSize = 32
stepSize = 1
boundaries = DIRICHLET
bndValues = 0
[population]
nSpecies = 2
nParticles = 32 pc
nAlloc = 32 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.3,0.01
[methods]
mode = regular
poisson = mgSolve
acc = puAccND1KE
distr = puDistrND1
migrate = puExtractEmigrantsND
[multigrid]
mgLevels = 3
mgCycles = 10
nPreSmooth = 4
nPostSmooth = 4
nCoarseSolve = 20
"""
    cfg = PincConfig.from_string(deck)
    sim = Simulation(cfg, seed=2)
    hist = sim.run(progress_every=0)
    assert np.isfinite(hist["kinetic"]).all()
    pos = np.asarray(sim.particles.pos())
    alive = np.asarray(sim.particles.alive)
    assert pos[alive].min() >= 0.0
    assert pos[alive].max() <= 31.0 + 1e-5
