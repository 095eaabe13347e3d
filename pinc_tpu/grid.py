"""Grid representation and whole-grid field operations.

TPU-native redesign of the reference's ``Grid`` (``src/core.h:261-277``,
``src/grid.c``).  The C code stores one flat lexicographic array with ghost
layers baked in and walks it with recursive strided pointer arithmetic; here
a field is simply a ``jnp.ndarray`` of shape ``(*dims, nValues)`` (vector
fields) or ``(*dims,)`` (scalars) holding only *true* grid nodes.  Ghost
layers never exist on the single-device path (periodic shifts via
``jnp.roll`` compile to cheap XLA slices/concats); on the sharded path they
are materialized transiently inside ``shard_map`` by ``parallel.halo``.

Static metadata lives in :class:`GridSpec`; field data is functional (ops
return new arrays), which is what XLA wants — no in-place mutation, full
fusion freedom.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .config import PincConfig


class BndType(Enum):
    """Boundary types per edge (reference bndType enum, src/core.h:145-150)."""
    PERIODIC = "PERIODIC"
    DIRICHLET = "DIRICHLET"
    NEUMANN = "NEUMANN"


@dataclass(frozen=True)
class GridSpec:
    """Static grid geometry (replaces Grid's size/trueSize/sizeProd/bnd
    bookkeeping, ``gAlloc``, src/grid.c:413-500)."""

    n_dims: int
    true_size: Tuple[int, ...]          # local nodes per subdomain, per dim
    n_subdomains: Tuple[int, ...]       # device-mesh extent per dim
    boundaries: Tuple[BndType, ...]     # lower+upper per dim, len 2*n_dims
    dtype: jnp.dtype = jnp.float32

    @property
    def global_size(self) -> Tuple[int, ...]:
        return tuple(t * n for t, n in zip(self.true_size, self.n_subdomains))

    @property
    def global_volume(self) -> int:
        return math.prod(self.global_size)

    @property
    def periodic(self) -> bool:
        return all(b is BndType.PERIODIC for b in self.boundaries)

    @classmethod
    def from_config(cls, cfg: PincConfig, dtype=None) -> "GridSpec":
        nd = cfg.get_int("grid:ndims")
        true_size = tuple(cfg.get_int_arr("grid:truesize", nd))
        nsub = tuple(cfg.get_int_arr("grid:nsubdomains", nd))
        bnd_names = cfg.get_str_arr("grid:boundaries", 2 * nd)
        bnd = tuple(BndType(b.strip().upper()) for b in bnd_names)
        if dtype is None:
            prec = cfg.get_str("methods:precision", "single").lower()
            dtype = jnp.float64 if prec == "double" else jnp.float32
        return cls(n_dims=nd, true_size=true_size, n_subdomains=nsub,
                   boundaries=bnd, dtype=dtype)

    # ------------------------------------------------------------- factories
    def zeros(self, n_values: int = 0) -> jnp.ndarray:
        shape = self.global_size if n_values == 0 else (*self.global_size, n_values)
        return jnp.zeros(shape, dtype=self.dtype)

    def local_zeros(self, n_values: int = 0) -> jnp.ndarray:
        shape = self.true_size if n_values == 0 else (*self.true_size, n_values)
        return jnp.zeros(shape, dtype=self.dtype)


# ---------------------------------------------------------------------------
# Differential operators (periodic single-block versions).
# Reference: gFinDiff1st (src/grid.c:226-261), gFinDiff2nd3D/ND
# (src/grid.c:264-334).  jnp.roll on a periodic block == reading through the
# wrap-around ghost layer.
# ---------------------------------------------------------------------------

def gradient(phi: jnp.ndarray) -> jnp.ndarray:
    """Centered first difference, one vector component per spatial dim:
    out[..., d] = 0.5*(phi[i+1] - phi[i-1]) along d (gFinDiff1st).  The
    caller negates for E = -grad(phi) exactly like main.c:178-180."""
    nd = phi.ndim
    comps = [0.5 * (jnp.roll(phi, -1, axis=d) - jnp.roll(phi, 1, axis=d))
             for d in range(nd)]
    return jnp.stack(comps, axis=-1)


def laplacian(phi: jnp.ndarray) -> jnp.ndarray:
    """Second-order stencil sum_d (phi[i-1] - 2 phi[i] + phi[i+1])
    (gFinDiff2ndND, src/grid.c:264-294), periodic."""
    nd = phi.ndim
    out = -2.0 * nd * phi
    for d in range(nd):
        out = out + jnp.roll(phi, -1, axis=d) + jnp.roll(phi, 1, axis=d)
    return out


def neutralize(rho: jnp.ndarray) -> jnp.ndarray:
    """Remove the mean charge (gNeutralizeGrid, src/grid.c:730-752); on the
    sharded path the mean is a psum — here a plain global mean."""
    return rho - jnp.mean(rho)


def potential_energy(rho: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Total field energy 0.5*sum(rho*phi) over true nodes
    (gPotEnergy, src/grid.c:1276-1321)."""
    return 0.5 * jnp.sum(rho.astype(jnp.float32) * phi.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Analytic field fillers for solver tests
# (gFillSin/gFillPolynomial & friends, src/grid.c:1350-1744).
# ---------------------------------------------------------------------------

def fill_sin(spec: GridSpec, modes: List[int] | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (rho, phi_exact) for rho = prod_d sin(2 pi m_d x_d / L_d),
    with phi the exact continuum solution of grad^2 phi = -rho."""
    L = spec.global_size
    nd = spec.n_dims
    modes = modes or [1] * nd
    axes = [np.arange(l, dtype=np.float64) for l in L]
    mesh = np.meshgrid(*axes, indexing="ij")
    rho = np.ones(L, dtype=np.float64)
    k2 = 0.0
    for d in range(nd):
        k = 2.0 * np.pi * modes[d] / L[d]
        rho = rho * np.sin(k * mesh[d])
        k2 += k * k
    phi = rho / k2
    return rho, phi
