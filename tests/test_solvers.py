"""Poisson solver tests: analytic sinusoid fixtures (the TPU equivalent of
mgModeErrorScaling, src/multigrid.c:1734-1851) and cross-solver
consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinc_tpu.grid import GridSpec, BndType, fill_sin, laplacian
from pinc_tpu.solvers.multigrid import MultigridSolver
from pinc_tpu.solvers.spectral import SpectralSolver


def spec3d(n):
    return GridSpec(n_dims=3, true_size=(n, n, n), n_subdomains=(1, 1, 1),
                    boundaries=(BndType.PERIODIC,) * 6)


def rms(x):
    return float(np.sqrt(np.mean(np.square(np.asarray(x, dtype=np.float64)))))


def test_spectral_fd_exact_inverse():
    """The finite-difference spectrum must invert grid.laplacian to
    round-off: lap(phi) + rho == 0."""
    spec = spec3d(16)
    rho_np, _ = fill_sin(spec)
    solver = SpectralSolver(spec.global_size, fd=True)
    phi = solver(jnp.asarray(rho_np, dtype=jnp.float32))
    resid = laplacian(phi) + jnp.asarray(rho_np, dtype=jnp.float32)
    assert rms(resid) < 1e-5


def test_spectral_continuum_matches_analytic():
    spec = spec3d(32)
    rho_np, phi_exact = fill_sin(spec)
    solver = SpectralSolver(spec.global_size, fd=False)
    phi = np.asarray(solver(jnp.asarray(rho_np, dtype=jnp.float32)))
    err = rms(phi - phi_exact) / rms(phi_exact)
    assert err < 1e-4


def test_spectral_1d_reference_factor():
    """1D: the continuum spectrum is the reference's (N/2 pi n)^2 factor
    (src/spectral.c:105-109)."""
    N = 32
    solver = SpectralSolver((N,), fd=False)
    rho = jnp.asarray(np.sin(2 * np.pi * np.arange(N) / N), dtype=jnp.float32)
    phi = np.asarray(solver(rho))
    expect = np.asarray(rho) * (N / (2 * np.pi)) ** 2
    assert np.allclose(phi, expect, rtol=1e-4, atol=1e-4)


def test_multigrid_matches_fd_spectral():
    """MG solves the same discrete system as the FD spectral solver; on a
    neutral random rhs they must agree."""
    spec = spec3d(32)
    rng = np.random.default_rng(0)
    rho_np = rng.normal(size=spec.global_size).astype(np.float32)
    rho_np -= rho_np.mean()
    rho = jnp.asarray(rho_np)

    fd = SpectralSolver(spec.global_size, fd=True)
    mg = MultigridSolver(spec.global_size, n_levels=4, n_pre=3, n_post=3,
                         n_coarse=20, max_cycles=30, tol=1e-6)
    phi_fd = np.asarray(fd(rho))
    phi_mg = np.asarray(mg(rho))
    phi_fd = phi_fd - phi_fd.mean()
    phi_mg = phi_mg - phi_mg.mean()
    # float32 smoothing floor on a pure-noise rhs: ~1e-3 relative
    assert rms(phi_fd - phi_mg) / max(rms(phi_fd), 1e-12) < 5e-3


def test_multigrid_residual_convergence():
    spec = spec3d(32)
    rho_np, _ = fill_sin(spec)
    rho = jnp.asarray(rho_np, dtype=jnp.float32)
    mg = MultigridSolver(spec.global_size, n_levels=4, n_pre=3, n_post=3,
                         n_coarse=20, max_cycles=20, tol=1e-7)
    phi = mg(rho)
    resid = laplacian(phi) + rho
    # |phi| ~ (L/2pi k)^2 * |rho| >> |rho|, so the f32 rounding floor of the
    # residual is ~eps*2D*|phi| ~ 3e-4 relative to rho
    assert rms(resid) / rms(rho_np) < 1e-3


def test_multigrid_error_scaling_order2():
    """Discretization error vs the continuum solution halves twice when the
    resolution doubles (measured order ~2, mgErrorScaling harness)."""
    errs = []
    for n in (16, 32):
        spec = spec3d(n)
        rho_np, phi_exact = fill_sin(spec)
        mg = MultigridSolver(spec.global_size, n_levels=3, n_pre=3, n_post=3,
                             n_coarse=30, max_cycles=30, tol=1e-7)
        phi = np.asarray(mg(jnp.asarray(rho_np, dtype=jnp.float32)))
        phi = phi - phi.mean()
        pe = phi_exact - phi_exact.mean()
        # the analytic phi has continuum normalization; scale-free error:
        errs.append(rms(phi - pe) / rms(pe))
    order = np.log2(errs[0] / errs[1])
    assert order > 1.5, (errs, order)


def test_multigrid_w_cycle_and_fmg():
    spec = spec3d(16)
    rho_np, _ = fill_sin(spec)
    rho = jnp.asarray(rho_np, dtype=jnp.float32)
    for cycle in ("mgW", "mgFMG"):
        mg = MultigridSolver(spec.global_size, n_levels=3, n_pre=2, n_post=2,
                             n_coarse=10, cycle=cycle, max_cycles=20, tol=1e-6)
        phi = mg(rho)
        assert rms(laplacian(phi) + rho) < 1e-4


def test_multigrid_divisibility_check():
    with pytest.raises(ValueError):
        MultigridSolver((12, 12, 12), n_levels=4)


def test_solvers_jit_compatible():
    spec = spec3d(16)
    rho_np, _ = fill_sin(spec)
    rho = jnp.asarray(rho_np, dtype=jnp.float32)
    mg = MultigridSolver(spec.global_size, n_levels=3, n_pre=2, n_post=2,
                         n_coarse=10, max_cycles=5, tol=1e-6)
    sp = SpectralSolver(spec.global_size)
    phi1 = jax.jit(mg)(rho)
    phi2 = jax.jit(sp)(rho)
    assert np.isfinite(np.asarray(phi1)).all()
    assert np.isfinite(np.asarray(phi2)).all()
