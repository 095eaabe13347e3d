"""Geometric multigrid Poisson solver.

TPU-native rebuild of the reference's ``src/multigrid.c``: solve
``grad^2 phi = -rho`` with a hierarchy of 2x-coarsened grids, red-black
Gauss-Seidel (or damped Jacobi) smoothing, half-weighting restriction and
multilinear prolongation, driven to an RMS-residual tolerance
(``mgSolveRaw``, src/multigrid.c:1688-1724, tol 1e-10).

Design notes versus the C:

* The C smoother sweeps pointers serially with per-color halo exchanges
  after every half-sweep (mgGS3D, src/multigrid.c:683-767 — 2 MPI
  exchanges x nDims per iteration).  Here one color update is a dense
  masked stencil over the whole block — a handful of ``jnp.roll``s that XLA
  fuses into one VPU pass; on the sharded path a single halo permute per
  half-sweep replaces the Sendrecv storm.
* Restriction (mgHalfRestrict3D, src/multigrid.c:844-911) = stencil pass +
  stride-2 slice.  Prolongation (mgBilinProl3D, src/multigrid.c:1127-1238)
  = zero-stuff + per-dimension linear fill; its three internal halo
  exchanges disappear on a periodic block.
* Cycles (V regular/recursive, FMG, W — src/multigrid.c:1496-1683) are
  Python recursion over a *static* level list, unrolled at trace time; the
  tolerance loop is a ``lax.while_loop`` so the whole solve stays on
  device.
* Levels with all-PERIODIC boundaries have a nullspace (the mean); the rhs
  is re-neutralized at every level exactly like the gNeutralizeGrid calls
  in mgVRegular (src/multigrid.c:1586-1626).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PincConfig
from ..registry import SOLVERS


# ---------------------------------------------------------------------------
# Stencil primitives (periodic)
# ---------------------------------------------------------------------------

def _neighbor_sum(phi: jax.Array) -> jax.Array:
    out = None
    for d in range(phi.ndim):
        s = jnp.roll(phi, 1, axis=d) + jnp.roll(phi, -1, axis=d)
        out = s if out is None else out + s
    return out


def _laplacian(phi: jax.Array) -> jax.Array:
    return _neighbor_sum(phi) - (2.0 * phi.ndim) * phi


def _checkerboard(shape: Sequence[int]) -> np.ndarray:
    """Red mask: (i+j+k+...) % 2 == 0.  Requires even extents per dim for a
    consistent periodic coloring (true for all power-of-two MG levels)."""
    acc = np.zeros(shape, dtype=np.int64)
    for d, L in enumerate(shape):
        sh = [1] * len(shape)
        sh[d] = L
        acc = acc + np.arange(L).reshape(sh)
    return (acc % 2) == 0


# ---------------------------------------------------------------------------
# Smoothers.  All solve grad^2 phi = -rho, i.e. the pointwise update is
# phi_i = (sum(neighbors) + rho_i) / (2*D).
# ---------------------------------------------------------------------------

def make_gauss_seidel_rb(shape: Sequence[int], n_iter: int) -> Callable:
    """Red-black Gauss-Seidel (mgGS2D/3D/ND, src/multigrid.c:584-837):
    update red sites from black neighbors, then black from updated red."""
    red = jnp.asarray(_checkerboard(shape))

    def smooth(phi: jax.Array, rho: jax.Array) -> jax.Array:
        inv2d = 1.0 / (2.0 * phi.ndim)

        def one_iter(_, phi):
            upd = (_neighbor_sum(phi) + rho) * inv2d
            phi = jnp.where(red, upd, phi)
            upd = (_neighbor_sum(phi) + rho) * inv2d
            phi = jnp.where(red, phi, upd)
            return phi
        return jax.lax.fori_loop(0, n_iter, one_iter, phi)
    return smooth


def make_jacobi(shape: Sequence[int], n_iter: int, omega: float = 2.0 / 3.0) -> Callable:
    """Damped Jacobi (mgJacobi1D/3D/ND, src/multigrid.c:413-552; damping
    added — plain Jacobi does not damp the highest mode)."""
    def smooth(phi: jax.Array, rho: jax.Array) -> jax.Array:
        inv2d = 1.0 / (2.0 * phi.ndim)

        def one_iter(_, phi):
            upd = (_neighbor_sum(phi) + rho) * inv2d
            return phi + omega * (upd - phi)
        return jax.lax.fori_loop(0, n_iter, one_iter, phi)
    return smooth


SMOOTHERS = {
    "gaussseidelrb": make_gauss_seidel_rb,
    "gaussseidelrbnd": make_gauss_seidel_rb,
    "gaussseidel": make_gauss_seidel_rb,
    "jacobi": make_jacobi,
    "jacobind": make_jacobi,
}


# ---------------------------------------------------------------------------
# Transfer operators
# ---------------------------------------------------------------------------

def restrict_half_weight(fine: jax.Array) -> jax.Array:
    """Half-weighting restriction (mgHalfRestrict3D/ND,
    src/multigrid.c:844-1022): coarse = 1/2 center + 1/(4D) face neighbors,
    sampled at even fine nodes."""
    D = fine.ndim
    stencil = 0.5 * fine + (0.25 / D) * _neighbor_sum(fine)
    slicer = tuple(slice(None, None, 2) for _ in range(D))
    return stencil[slicer]


def prolong_multilinear(coarse: jax.Array) -> jax.Array:
    """Multilinear prolongation (mgBilinProl3D/ND, src/multigrid.c:1096-1238):
    zero-stuff even nodes then fill odd nodes dimension by dimension with
    averages of already-filled neighbors (periodic)."""
    D = coarse.ndim
    fine_shape = tuple(2 * s for s in coarse.shape)
    fine = jnp.zeros(fine_shape, dtype=coarse.dtype)
    slicer = tuple(slice(None, None, 2) for _ in range(D))
    fine = fine.at[slicer].set(coarse)
    for d in range(D):
        # odd planes along d = average of even neighbors along d
        avg = 0.5 * (fine + jnp.roll(fine, -2, axis=d))
        odd = [slice(None)] * D
        odd[d] = slice(1, None, 2)
        src = [slice(None)] * D
        src[d] = slice(0, None, 2)
        fine = fine.at[tuple(odd)].set(avg[tuple(src)])
    return fine


RESTRICTORS = {
    "halfweight": restrict_half_weight,
    "halfweightnd": restrict_half_weight,
}
PROLONGATORS = {
    "bilinear": prolong_multilinear,
    "bilinearnd": prolong_multilinear,
}


# ---------------------------------------------------------------------------
# Cycles + tolerance driver
# ---------------------------------------------------------------------------

def _neutral(x: jax.Array) -> jax.Array:
    return x - jnp.mean(x)


class MultigridSolver:
    """Callable phi = solve(rho).  All level geometry is static; the cycle
    is unrolled at trace time and the outer tolerance loop is a
    lax.while_loop (mgSolveRaw semantics, src/multigrid.c:1688-1724)."""

    def __init__(self, shape: Sequence[int], n_levels: int = 4,
                 n_pre: int = 10, n_post: int = 10, n_coarse: int = 10,
                 cycle: str = "mgvrecursive", smoother: str = "gaussseidelrb",
                 max_cycles: int = 15, tol: float = 1e-10,
                 dtype=jnp.float32):
        shape = tuple(shape)
        for s in shape:
            if s % (1 << (n_levels - 1)) != 0:
                raise ValueError(
                    f"grid extent {s} not divisible by 2^{n_levels-1} "
                    f"(mgAllocSubGrids check, src/multigrid.c:317-329)")
        self.shape = shape
        self.n_levels = n_levels
        self.cycle = cycle.lower()
        self.max_cycles = max_cycles
        self.tol = tol
        self.dtype = dtype

        self._shapes: List[Tuple[int, ...]] = [
            tuple(s >> l for s in shape) for l in range(n_levels)]
        mk = SMOOTHERS[smoother.lower()]
        self._pre = [mk(s, n_pre) for s in self._shapes]
        self._post = [mk(s, n_post) for s in self._shapes]
        self._coarse = mk(self._shapes[-1], n_coarse)

    # ------------------------------------------------------------- v-cycle
    def _vcycle(self, level: int, phi: jax.Array, rho: jax.Array) -> jax.Array:
        if level == self.n_levels - 1:
            return self._coarse(phi, rho)
        phi = self._pre[level](phi, rho)
        defect = _neutral(rho + _laplacian(phi))      # mgResidual, mc:1385
        rhs_c = restrict_half_weight(defect)
        err_c = jnp.zeros(self._shapes[level + 1], dtype=phi.dtype)
        err_c = self._vcycle(level + 1, err_c, rhs_c)
        if self.cycle in ("mgw", "w"):                # W-cycle: recurse twice
            err_c = self._vcycle(level + 1, err_c, rhs_c)
        phi = phi + prolong_multilinear(err_c)
        phi = self._post[level](phi, rho)
        return phi

    def _fmg(self, rho: jax.Array) -> jax.Array:
        """Full multigrid (mgFMG, src/multigrid.c:1652-1673): solve coarsest
        first, prolong up, V-cycle at each level."""
        rhs = [rho]
        for l in range(1, self.n_levels):
            rhs.append(restrict_half_weight(rhs[-1]))
        phi = jnp.zeros(self._shapes[-1], dtype=rho.dtype)
        phi = self._coarse(phi, rhs[-1])
        for l in range(self.n_levels - 2, -1, -1):
            phi = prolong_multilinear(phi)
            phi = self._vcycle(l, phi, rhs[l])
        return phi

    # --------------------------------------------------------------- solve
    def __call__(self, rho: jax.Array, phi0: jax.Array | None = None) -> jax.Array:
        rho = _neutral(rho.astype(self.dtype))
        if phi0 is None:
            phi0 = jnp.zeros(self.shape, dtype=self.dtype)
        if self.cycle in ("mgfmg", "fmg"):
            phi0 = self._fmg(rho)

        tol2 = jnp.asarray(self.tol ** 2, dtype=jnp.float32)

        def rms2(phi):
            r = rho + _laplacian(phi)
            return jnp.mean(jnp.square(r.astype(jnp.float32)))

        def cond(carry):
            phi, i, r2 = carry
            return jnp.logical_and(i < self.max_cycles, r2 > tol2)

        def body(carry):
            phi, i, _ = carry
            phi = self._vcycle(0, phi, rho)
            return (phi, i + 1, rms2(phi))

        phi, n_cycles, r2 = jax.lax.while_loop(
            cond, body, (phi0, jnp.asarray(0), rms2(phi0)))
        return _neutral(phi)


# ---------------------------------------------------------------------------
# Registry binding — reads the [multigrid] ini section
# (mgSetSolver/getMgAlgo, src/multigrid.c:28-125)
# ---------------------------------------------------------------------------

def _validate(cfg: PincConfig):
    nd = cfg.get_int("grid:ndims")
    bnds = cfg.get_str_arr("grid:boundaries", 2 * nd)
    if any(b.strip().upper() != "PERIODIC" for b in bnds):
        # Dirichlet/Neumann arrive with the bc module (grid.c:922-1023)
        raise NotImplementedError(
            "multigrid currently supports PERIODIC boundaries")


def make_from_config(cfg: PincConfig) -> MultigridSolver:
    from ..grid import GridSpec
    spec = GridSpec.from_config(cfg)
    dtype = spec.dtype
    default_tol = 1e-10 if dtype == jnp.float64 else 5e-6
    return MultigridSolver(
        shape=spec.global_size,
        n_levels=cfg.get_int("multigrid:mglevels", 4),
        n_pre=cfg.get_int("multigrid:npresmooth", 10),
        n_post=cfg.get_int("multigrid:npostsmooth", 10),
        n_coarse=cfg.get_int("multigrid:ncoarsesolve", 10),
        cycle=cfg.get_str("multigrid:cycle", "mgVRecursive"),
        smoother=cfg.get_str("multigrid:presmooth", "gaussSeidelRB"),
        max_cycles=cfg.get_int("multigrid:mgcycles", 15),
        tol=cfg.get_double("multigrid:tol", default_tol),
        dtype=dtype,
    )


SOLVERS.register("mgSolve", _validate)(make_from_config)
SOLVERS.register("mgSolver", _validate)(make_from_config)
SOLVERS.register("multigrid", _validate)(make_from_config)
