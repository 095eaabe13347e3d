"""Sharded multigrid (parallel/mg.py): shard_map smoothers with explicit
halo permutes must reproduce the single-block solver exactly — same
cycle structure, same smoother counts, same BCs (VERDICT item 4
acceptance: sharded == single tests on bounded decks, routed through
make_sharded_solver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinc_tpu.bc import BCSpec
from pinc_tpu.grid import BndType, GridSpec, fill_sin, fill_sin_dirichlet
from pinc_tpu.parallel.mesh import make_mesh
from pinc_tpu.parallel.mg import ShardedMultigridSolver, _max_levels
from pinc_tpu.solvers.multigrid import MultigridSolver

PARAMS = dict(n_levels=3, n_pre=4, n_post=4, n_coarse=20, max_cycles=8,
              tol=1e-12)   # tol unreachable -> both run the full 8 cycles


def _spec(n, periodic=True):
    b = BndType.PERIODIC if periodic else BndType.DIRICHLET
    return GridSpec(n_dims=3, true_size=(n, n, n), n_subdomains=(1, 1, 1),
                    boundaries=(b,) * 6)


def _run_pair(rho_np, nsub, bc=None, cycle="mgvrecursive"):
    n = rho_np.shape[0]
    single = MultigridSolver((n,) * 3, cycle=cycle, bc=bc, **PARAMS)
    ctx = make_mesh(nsub, tuple(n // s for s in nsub))
    sharded = ShardedMultigridSolver(ctx, cycle=cycle, bc=bc, **PARAMS)
    rho = jnp.asarray(rho_np, jnp.float32)
    phi1 = np.asarray(jax.jit(single)(rho))
    rho_sh = jax.device_put(rho, ctx.sharding(ctx.field_spec()))
    phi2 = np.asarray(jax.jit(sharded)(rho_sh))
    return phi1, phi2


@pytest.mark.parametrize("nsub", [(2, 2, 2), (2, 1, 1), (1, 2, 4)])
def test_sharded_mg_matches_single_periodic(cpu_devices, nsub):
    rho_np, _ = fill_sin(_spec(16))
    phi1, phi2 = _run_pair(rho_np, nsub)
    scale = np.abs(phi1).max()
    assert np.abs(phi1 - phi2).max() < 2e-5 * scale, (
        np.abs(phi1 - phi2).max(), scale)


def test_sharded_mg_matches_single_dirichlet(cpu_devices):
    """Bounded deck with INHOMOGENEOUS Dirichlet values: the edge devices
    must clamp/ghost exactly like the single-block pad_bc."""
    bc = BCSpec(lower=(BndType.DIRICHLET,) * 3,
                upper=(BndType.DIRICHLET,) * 3,
                lower_value=(0.5, 0.0, -0.25), upper_value=(1.0, 0.25, 0.0))
    rho_np, _ = fill_sin_dirichlet(_spec(16, periodic=False))
    phi1, phi2 = _run_pair(rho_np, (2, 2, 2), bc=bc)
    scale = max(np.abs(phi1).max(), 1e-12)
    assert np.abs(phi1 - phi2).max() < 2e-5 * scale


def test_sharded_mg_mixed_bc(cpu_devices):
    """Periodic x/y with Neumann z walls."""
    bc = BCSpec(lower=(BndType.PERIODIC, BndType.PERIODIC, BndType.NEUMANN),
                upper=(BndType.PERIODIC, BndType.PERIODIC, BndType.NEUMANN),
                lower_value=(0.0, 0.0, 0.1), upper_value=(0.0, 0.0, 0.1))
    rho_np, _ = fill_sin(_spec(16))
    phi1, phi2 = _run_pair(rho_np, (2, 2, 1), bc=bc)
    scale = max(np.abs(phi1).max(), 1e-12)
    assert np.abs(phi1 - phi2).max() < 2e-5 * scale


@pytest.mark.parametrize("cycle", ["mgW", "mgFMG"])
def test_sharded_mg_cycles(cpu_devices, cycle):
    rho_np, _ = fill_sin(_spec(16))
    phi1, phi2 = _run_pair(rho_np, (2, 2, 2), cycle=cycle)
    scale = np.abs(phi1).max()
    assert np.abs(phi1 - phi2).max() < 2e-5 * scale


def test_sharded_mg_solves(cpu_devices):
    """It actually solves: residual below tolerance on a 32^3 (2,2,2)
    mesh with realistic smoother counts."""
    from pinc_tpu.grid import laplacian
    rho_np, _ = fill_sin(_spec(32))
    ctx = make_mesh((2, 2, 2), (16, 16, 16))
    mg = ShardedMultigridSolver(ctx, n_levels=3, n_pre=10, n_post=10,
                                n_coarse=20, max_cycles=15, tol=1e-6)
    rho = jax.device_put(jnp.asarray(rho_np, jnp.float32),
                         ctx.sharding(ctx.field_spec()))
    phi = jax.jit(mg)(rho)
    r = np.asarray(laplacian(jnp.asarray(np.asarray(phi))) + rho_np)
    assert np.sqrt((r ** 2).mean()) < 1e-5


def test_max_levels():
    ctx = make_mesh((1, 1, 1), (16, 16, 16))
    assert _max_levels(ctx) == 5
    ctx = make_mesh((1, 1, 1), (16, 8, 16))
    assert _max_levels(ctx) == 4


def test_make_sharded_solver_routes_mg(cpu_devices):
    """Decks selecting mgSolve on a mesh route through the REAL sharded
    multigrid, not the auto-partitioned fallback."""
    from pinc_tpu.config import PincConfig
    from pinc_tpu.parallel.pencil_fft import make_sharded_solver
    from pinc_tpu.solvers.multigrid import make_from_config

    deck = """
[grid]
nDims = 3
nSubdomains = 2,2,2
trueSize = 8,8,8
stepSize = 1
boundaries = PERIODIC
[multigrid]
mgLevels = 3
"""
    cfg = PincConfig.from_string(deck)
    solver = make_from_config(cfg)
    ctx = make_mesh((2, 2, 2), (8, 8, 8))
    sharded = make_sharded_solver(solver, ctx, cfg, jnp.float32)
    assert isinstance(sharded, ShardedMultigridSolver)
    # levels capped so local extents stay whole
    assert sharded.n_levels <= _max_levels(ctx)


def test_mg_mode_sharded(tmp_path):
    """mgMode on a decomposed deck (grid:nSubdomains > 1) runs the
    shard_map solver on the device mesh and persists the measured
    cycle count, like the reference's mgMode on the decomposed grid
    (src/multigrid.c:1856-2014)."""
    from pinc_tpu.config import PincConfig
    from pinc_tpu.simulation import RUN_MODES

    deck = f"""
[files]
output = {tmp_path}/mg/
[time]
nTimeSteps = 1
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 2,2,2
trueSize = 16,16,16
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 1 pc
nAlloc = 1 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
temperature = 0
[methods]
mode = mgMode
poisson = mgSolve
[multigrid]
mgLevels = 3
mgCycles = 20
nPreSmooth = 4
nPostSmooth = 4
nCoarseSolve = 20
nRepetitions = 2
"""
    cfg = PincConfig.from_string(deck)
    run = RUN_MODES.select(cfg, "methods:mode")
    result = run()
    assert result["seconds"] > 0
    assert 0 < result["cycles"] <= 20
    assert result["rms_error"] < 0.1
    import h5py
    with h5py.File(f"{tmp_path}/mg/timer.xy.h5") as f:
        assert f["cycles"][0, 1] == result["cycles"]


def test_mg_error_scaling_sharded():
    """mgModeErrorScaling on a decomposed deck measures ~2nd order on
    the sharded solver (both resolutions on the device mesh)."""
    from pinc_tpu.config import PincConfig
    from pinc_tpu.simulation import RUN_MODES

    deck = """
[time]
nTimeSteps = 1
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 2,2,1
trueSize = 16,16,32
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 1 pc
nAlloc = 1 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
temperature = 0
[methods]
mode = mgModeErrorScaling
poisson = mgSolve
[multigrid]
mgLevels = 3
mgCycles = 30
nPreSmooth = 4
nPostSmooth = 4
nCoarseSolve = 30
"""
    cfg = PincConfig.from_string(deck)
    run = RUN_MODES.select(cfg, "methods:mode")
    result = run()
    assert result["order"] > 1.5, result


def test_sharded_mg_agglomerated_bottom_matches_single(cpu_devices):
    """Coarse-grid agglomeration: on a 24^3 grid over (2,2,2) the
    per-subdomain clamp stops the sharded hierarchy at 3 levels (local
    12 % 8 != 0); the agglomerated bottom continues 2 more replicated
    levels on the gathered 6^3 grid, which makes the cycle structurally
    IDENTICAL to the single-device 4-level solver — same smoother
    schedule at every depth, so the solutions match."""
    n = 24
    p = dict(n_pre=4, n_post=4, n_coarse=20, max_cycles=8, tol=1e-12)
    rho_np, _ = fill_sin(GridSpec(n_dims=3, true_size=(n,) * 3,
                                  n_subdomains=(1, 1, 1),
                                  boundaries=(BndType.PERIODIC,) * 6))[0:2]
    single = MultigridSolver((n,) * 3, n_levels=4, **p)
    ctx = make_mesh((2, 2, 2), (n // 2,) * 3)
    sharded = ShardedMultigridSolver(ctx, n_levels=3, n_bottom_levels=2,
                                     **p)
    assert sharded._bottom is not None
    assert sharded._bottom.n_levels == 2
    assert sharded._bottom.shape == (6, 6, 6)
    rho = jnp.asarray(rho_np, jnp.float32)
    phi1 = np.asarray(jax.jit(single)(rho))
    rho_sh = jax.device_put(rho, ctx.sharding(ctx.field_spec()))
    phi2 = np.asarray(jax.jit(sharded)(rho_sh))
    scale = np.abs(phi1).max()
    assert np.abs(phi1 - phi2).max() < 2e-5 * scale, (
        np.abs(phi1 - phi2).max(), scale)


def test_sharded_mg_agglomerated_cycle_count(cpu_devices):
    """VERDICT r4 item 10 'done' bar: the solve-to-tolerance cycle count
    with the agglomerated bottom matches the single-device solver's
    (instead of leaning on n_coarse smooths at a clamped depth)."""
    n = 24
    p = dict(n_pre=4, n_post=4, n_coarse=20, max_cycles=15, tol=1e-6)
    rho_np, _ = fill_sin(GridSpec(n_dims=3, true_size=(n,) * 3,
                                  n_subdomains=(1, 1, 1),
                                  boundaries=(BndType.PERIODIC,) * 6))[0:2]
    single = MultigridSolver((n,) * 3, n_levels=4, **p)
    ctx = make_mesh((2, 2, 2), (n // 2,) * 3)
    sharded = ShardedMultigridSolver(ctx, n_levels=3, n_bottom_levels=2,
                                     **p)
    rho = jnp.asarray(rho_np, jnp.float32)
    _, n1, r1 = jax.jit(single.solve_with_stats)(rho)
    rho_sh = jax.device_put(rho, ctx.sharding(ctx.field_spec()))
    _, n2, r2 = jax.jit(sharded.solve_with_stats)(rho_sh)
    assert int(n1) == int(n2), (int(n1), int(n2))
    # f32 residuals floor above the nominal tol; parity with the
    # single-device solver is the bar, not an absolute threshold
    assert float(r2) <= 2.0 * float(r1) + 1e-12, (float(r1), float(r2))


def test_from_single_agglomerates(cpu_devices):
    """Deck depth beyond the subdomain clamp routes the surplus into the
    agglomerated bottom instead of silently truncating the hierarchy."""
    from pinc_tpu.config import PincConfig
    from pinc_tpu.parallel.pencil_fft import make_sharded_solver
    from pinc_tpu.solvers.multigrid import make_from_config

    deck = """
[grid]
nDims = 3
nSubdomains = 2,2,2
trueSize = 12,12,12
stepSize = 1
boundaries = PERIODIC
[multigrid]
mgLevels = 4
"""
    cfg = PincConfig.from_string(deck)
    solver = make_from_config(cfg)
    ctx = make_mesh((2, 2, 2), (12, 12, 12))
    sharded = make_sharded_solver(solver, ctx, cfg, jnp.float32)
    assert isinstance(sharded, ShardedMultigridSolver)
    assert sharded.n_levels == 3          # 12 % 8 != 0 clamps at 3
    assert sharded._bottom is not None    # surplus level agglomerated
    assert sharded._bottom.shape == (6, 6, 6)
