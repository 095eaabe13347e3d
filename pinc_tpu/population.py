"""Particle population: storage, initial conditions, bookkeeping.

TPU-native redesign of the reference's ``Population`` (``src/core.h:72-86``,
``src/population.c``).  The C code keeps one flat SoA array with per-species
``iStart/iStop`` ranges and deletes particles by back-filling; both are
shape-dynamic and hostile to XLA.  Here each species owns a *fixed-capacity*
slab of a stacked array:

    cell : int32  (nSpecies, cap, nDims)   integer cell index
    frac : float  (nSpecies, cap, nDims)   offset within the cell, in [0,1)
    vel  : float  (nSpecies, cap, nDims)   velocity, cells/step
    alive: bool   (nSpecies, cap)          slot occupancy mask

Positions are stored in fixed-point split form (cell + frac) rather than one
float: CIC weights are then exact at any domain size and float32 never loses
resolution at large coordinates — the TPU answer to the C code's double
positions.  Dead slots simply carry zero weight everywhere (deposition,
energy), replacing ``pNew``/``pCut`` back-fill (src/population.c:430-466)
with mask discipline.

Initial conditions reproduce the reference's generators (lattice, uniform,
sinusoidal perturbation, Maxwellian — src/population.c:110-428) on the host
in float64, then split into (cell, frac).  RNG is numpy's MT19937 seeded per
deck; the reference's GSL stream is not bit-reproducible from Python, which
only affects statistically-equivalent random ICs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import PincConfig, global_size
from .grid import GridSpec


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SpeciesParams:
    """Per-superparticle charge/mass in simulation units, post-normalization
    (what pAlloc reads after uNormalize, src/population.c:42-92)."""
    charge: jax.Array  # (S,)
    mass: jax.Array    # (S,)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Particles:
    cell: jax.Array   # (S, cap, D) int32
    frac: jax.Array   # (S, cap, D) float
    vel: jax.Array    # (S, cap, D) float
    alive: jax.Array  # (S, cap) bool

    @property
    def n_species(self) -> int:
        return self.cell.shape[0]

    @property
    def capacity(self) -> int:
        return self.cell.shape[1]

    @property
    def n_dims(self) -> int:
        return self.cell.shape[2]

    def pos(self) -> jax.Array:
        """Float positions (for IO/diagnostics only)."""
        return self.cell.astype(self.frac.dtype) + self.frac

    def counts(self) -> jax.Array:
        return jnp.sum(self.alive, axis=1)


# ---------------------------------------------------------------------------
# Host-side initial conditions
# ---------------------------------------------------------------------------

def _split_pos(pos: np.ndarray, L: np.ndarray, dtype) -> Tuple[np.ndarray, np.ndarray]:
    """Wrap periodically and split float64 positions into (cell, frac)."""
    pos = np.mod(pos, L)
    cell = np.floor(pos).astype(np.int64)
    frac = pos - cell
    # guard against frac == 1.0 from rounding
    bump = frac >= 1.0
    cell = cell + bump
    frac = np.where(bump, 0.0, frac)
    cell = np.mod(cell, L.astype(np.int64))
    return cell.astype(np.int32), frac.astype(dtype)


def _lattice_positions(n: int, L: np.ndarray) -> np.ndarray:
    """Evenly spaced lattice: particle i at mixed-radix unfolding of i*l
    where l = (V/N)^(1/D) (pPosLattice, src/population.c:172-240)."""
    nd = len(L)
    V = float(np.prod(L))
    l = (V / n) ** (1.0 / nd)
    linear = l * np.arange(n, dtype=np.float64)
    pos = np.empty((n, nd), dtype=np.float64)
    for d in range(nd):
        pos[:, d] = np.mod(linear, L[d])
        linear = linear / L[d]
    return pos


def _uniform_positions(n: int, L: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Uniform over the global domain (pPosUniform, src/population.c:110-170)."""
    return rng.uniform(0.0, 1.0, size=(n, len(L))) * L


def _perturb(pos: np.ndarray, amplitude: np.ndarray, mode: np.ndarray,
             L: np.ndarray) -> np.ndarray:
    """x_d += A_d * cos(2 pi m_d x_d / L_d)  (pPosPerturb,
    src/population.c:242-276)."""
    theta = 2.0 * np.pi * mode * pos / L
    return pos + amplitude * np.cos(theta)


def initialize(cfg: PincConfig, spec: GridSpec, seed: int = 1) -> Tuple[Particles, SpeciesParams]:
    """Build the initial population per the deck.

    Follows the reference's regular() IC sequence (src/main.c:141-160):
    positions from ``population:icPositions`` (default ``lattice``, matching
    main.c's pPosLattice), velocities Maxwellian if thermalVelocity/drift is
    nonzero else zero, then the sinusoidal position perturbation whenever
    ``perturbAmplitude`` is nonzero.  (Current reference main.c has the
    perturbation call commented out; decks carry the keys and the Langmuir
    verification runs require it, so it is honored here.)
    """
    nd = spec.n_dims
    ns = cfg.get_int("population:nspecies")
    n_particles = [int(v) for v in cfg.get_double_arr("population:nparticles", ns)]
    n_alloc_key = "population:nalloc" if "population:nalloc" in cfg else "population:nparticles"
    n_alloc = [int(v) for v in cfg.get_double_arr(n_alloc_key, ns)]
    cap = max(max(n_alloc), max(n_particles))

    charge = np.asarray(cfg.get_double_arr("population:charge", ns))
    mass = np.asarray(cfg.get_double_arr("population:mass", ns))

    vth = np.asarray(cfg.get_double_arr("population:thermalvelocity", ns)
                     if "population:thermalvelocity" in cfg else [0.0] * ns)
    drift = np.asarray(cfg.get_double_arr("population:drift", ns)
                       if "population:drift" in cfg else [0.0] * ns)

    pert_amp = np.zeros((ns, nd))
    pert_mode = np.zeros((ns, nd))
    if "population:perturbamplitude" in cfg:
        pert_amp = np.asarray(
            cfg.get_double_arr("population:perturbamplitude", ns * nd)).reshape(ns, nd)
    if "population:perturbmode" in cfg:
        pert_mode = np.asarray(
            cfg.get_double_arr("population:perturbmode", ns * nd)).reshape(ns, nd)

    L = np.asarray(spec.global_size, dtype=np.float64)
    rng = np.random.default_rng(seed)
    ic_pos = cfg.get_str("population:icpositions", "lattice").lower()
    dtype = np.dtype(spec.dtype)

    cells = np.zeros((ns, cap, nd), dtype=np.int32)
    fracs = np.zeros((ns, cap, nd), dtype=dtype)
    vels = np.zeros((ns, cap, nd), dtype=dtype)
    alive = np.zeros((ns, cap), dtype=bool)

    for s in range(ns):
        n = n_particles[s]
        if n > cap:
            raise ValueError(f"species {s}: nParticles {n} exceeds capacity {cap}")
        if ic_pos == "lattice":
            pos = _lattice_positions(n, L)
        elif ic_pos == "uniform":
            pos = _uniform_positions(n, L, rng)
        else:
            raise ValueError(f"unknown icPositions '{ic_pos}'")
        if np.any(pert_amp[s] != 0.0):
            pos = _perturb(pos, pert_amp[s], pert_mode[s], L)
        cell, frac = _split_pos(pos, L, dtype)
        cells[s, :n] = cell
        fracs[s, :n] = frac
        if vth[s] != 0.0:
            vels[s, :n] = rng.normal(drift[s], vth[s], size=(n, nd))
        elif drift[s] != 0.0:
            vels[s, :n] = drift[s]
        alive[s, :n] = True

    particles = Particles(cell=jnp.asarray(cells), frac=jnp.asarray(fracs),
                          vel=jnp.asarray(vels), alive=jnp.asarray(alive))
    params = SpeciesParams(charge=jnp.asarray(charge, dtype=spec.dtype),
                           mass=jnp.asarray(mass, dtype=spec.dtype))
    return particles, params


# ---------------------------------------------------------------------------
# Energy bookkeeping helpers (pSumKinEnergy / pSumPotEnergy,
# src/population.c:700-720 — totals are just sums over species here).
# ---------------------------------------------------------------------------

def kinetic_energy(p: Particles, params: SpeciesParams) -> jax.Array:
    """Instantaneous KE per species: 0.5*m*sum(v^2) over alive particles.
    The production path instead uses the time-centered KE computed inside
    the accelerator (ops.pusher), matching puAcc*KE (src/pusher.c:197-210)."""
    v2 = jnp.sum(p.vel * p.vel, axis=-1)          # (S, cap)
    v2 = jnp.where(p.alive, v2, 0.0)
    return 0.5 * params.mass * jnp.sum(v2, axis=1)
