"""The simulation driver: deck -> jitted time step -> run modes.

TPU-native equivalent of the reference's ``main.c``: method selection
(src/main.c:55-79), allocation (src/main.c:84-107), the leapfrog half-kick
initialization (src/main.c:141-186) and the production time loop
(src/main.c:197-274) — except that the *entire* per-step pipeline

    move -> migrate -> deposit -> solve -> E=-grad(phi) -> kick (+energies)

is one pure function compiled once by XLA.  There are no halo exchanges or
barriers on the single-block path; on the sharded path (parallel/) the same
pipeline runs inside ``shard_map`` with collective permutes where the C code
had MPI_Sendrecv.

Per-step field/particle HDF5 output is decoupled from the device loop: the
step returns the state + a small diagnostics pytree, and ``run`` only pulls
snapshots to host on the configured output cadence.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .bc import BCSpec, gradient_bc
from .config import PincConfig
from .grid import GridSpec, gradient, potential_energy
from .population import Particles, SpeciesParams, initialize
from .registry import ACCELERATORS, DISTRIBUTORS, MIGRATORS, RUN_MODES, SOLVERS
from .units import Units, alloc_and_normalize
from .utils.logging import STATUS, TIMER, WARNING, msg
from .ops import pusher as _pusher_ops          # noqa: F401 (registry side effects)
from .solvers import spectral as _spectral      # noqa: F401
from .solvers import multigrid as _multigrid    # noqa: F401


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Diagnostics:
    kin_energy: jax.Array   # (S,) time-centered KE per species
    pot_energy: jax.Array   # () total field energy 0.5*sum(rho*phi)
    # particles dropped by migration-buffer overflow this step (the
    # reference's documented unsafe spot, src/pusher.c:776,913 — here it
    # is counted and reported instead of corrupting memory)
    n_lost: jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class StepOutput:
    particles: Particles
    rho: jax.Array
    phi: jax.Array
    E: jax.Array
    diag: Diagnostics
    # persistent object surface charge (None when the deck has no objects);
    # accumulates absorbed-particle charge across steps like the
    # reference's rhoObj grid (src/main.c:222, object.c:460-515)
    rho_obj: Optional[jax.Array] = None
    # equipotential value per object from the capacitance application
    # (the "Potential-check" STATUS at src/object.c:338)
    obj_potential: Optional[jax.Array] = None


class Simulation:
    """Owns the configuration, the static problem setup, and the jitted
    step.  Mirrors the lifetime of regular() in the reference."""

    def __init__(self, cfg: PincConfig, seed: int = 1):
        self.cfg = cfg
        self.units: Units = alloc_and_normalize(cfg)
        self.spec = GridSpec.from_config(cfg)

        # method selection — same ini names as the reference's select()s
        self.acc = ACCELERATORS.select(cfg, "methods:acc")
        self.distr = DISTRIBUTORS.select(cfg, "methods:distr")
        self.migrate = MIGRATORS.select(cfg, "methods:migrate",
                                        default="puExtractEmigrantsND")
        self.solver = SOLVERS.select(cfg, "methods:poisson")

        self.bc = BCSpec.from_config(cfg)
        self.particles, self.params = initialize(cfg, self.spec, seed=seed)
        self.n_time_steps = cfg.get_int("time:ntimesteps")

        from . import objects as _objects
        self.objects = _objects.from_config(cfg, self.spec, self.solver)
        self.rho_obj = (self.spec.zeros() if self.objects is not None
                        else None)

        self._step_jit = jax.jit(self._step, donate_argnums=(0, 1))
        self._half_kick_jit = jax.jit(self._half_kick, donate_argnums=(0,))

    # ----------------------------------------------------------------- step
    def _fields_from_particles(self, particles: Particles):
        rho = self.distr(particles, self.params, self.spec.global_size,
                         periodic=self.spec.periodic, dtype=self.spec.dtype)
        phi = self.solver(rho)
        if self.spec.periodic:
            E = -gradient(phi)
        else:
            E = -gradient_bc(phi, self.bc)
        return rho, phi, E

    def _half_kick(self, particles: Particles) -> StepOutput:
        """Initialization: cull particles inside objects, solve the initial
        field and advance velocities a half step back
        (src/main.c:161-186: oCollectObjectCharge with zeroed rhoObj, then
        gMul(E,0.5); acc; gMul(E,2))."""
        rho_obj = None
        obj_phi = None
        if self.objects is not None:
            particles, _ = self.objects.collect_charge(
                particles, self.params, self.spec.zeros())
            rho_obj = self.spec.zeros()
        rho, phi, E = self._fields_from_particles(particles)
        particles, ke = self.acc(particles, self.params, 0.5 * E,
                                 periodic=self.spec.periodic)
        pe = potential_energy(rho, phi)
        return StepOutput(particles, rho, phi, E,
                          Diagnostics(kin_energy=ke, pot_energy=pe,
                                      n_lost=jnp.zeros((), jnp.int32)),
                          rho_obj=rho_obj, obj_potential=obj_phi)

    def _step(self, particles: Particles,
              rho_obj: Optional[jax.Array] = None) -> StepOutput:
        """One full leapfrog step — the body of the reference time loop
        (src/main.c:197-274), including the object feedback sequence
        (collect -> deposit -> rho+=rhoObj -> solve -> capacitance -> solve,
        src/main.c:222-240)."""
        particles = _pusher_ops.move(particles, self.spec.global_size,
                                     periodic=self.spec.periodic)
        if not self.spec.periodic:
            # bounded domain: specular reflection at the walls
            particles = _pusher_ops.reflect(particles, self.spec.global_size)
        particles = self.migrate(particles)

        obj_phi = None
        if self.objects is not None:
            particles, rho_obj = self.objects.collect_charge(
                particles, self.params, rho_obj)
            rho = self.distr(particles, self.params, self.spec.global_size,
                             periodic=self.spec.periodic,
                             dtype=self.spec.dtype)
            rho = rho + rho_obj
            phi = self.solver(rho)
            rho, obj_phi = self.objects.apply_capacitance(rho, phi)
            phi = self.solver(rho)          # 2nd solve (src/main.c:240)
            E = (-gradient(phi) if self.spec.periodic
                 else -gradient_bc(phi, self.bc))
        else:
            rho, phi, E = self._fields_from_particles(particles)

        particles, ke = self.acc(particles, self.params, E,
                                 periodic=self.spec.periodic)
        pe = potential_energy(rho, phi)
        return StepOutput(particles, rho, phi, E,
                          Diagnostics(kin_energy=ke, pot_energy=pe,
                                      n_lost=jnp.zeros((), jnp.int32)),
                          rho_obj=rho_obj, obj_potential=obj_phi)

    # ---------------------------------------------------------------- scan
    def make_scan_steps(self, n: int):
        """Compile an n-step inner loop with lax.scan: returns
        ((particles, rho_obj) -> ((particles, rho_obj), stacked (ke, pe)))
        for benchmarking and IO-free runs."""
        def body(carry, _):
            particles, rho_obj = carry
            out = self._step(particles, rho_obj)
            return ((out.particles, out.rho_obj),
                    (out.diag.kin_energy, out.diag.pot_energy))

        @jax.jit
        def run_n(particles, rho_obj=None):
            return jax.lax.scan(body, (particles, rho_obj), None, length=n)
        return run_n

    # ----------------------------------------------------------------- run
    def run(self, writer=None, progress_every: int = 10) -> Dict[str, np.ndarray]:
        """The regular() run mode: half-kick init, nTimeSteps steps,
        per-step energy history, optional HDF5 writer callbacks."""
        t_start = time.monotonic()
        out = self._half_kick_jit(self.particles)
        if writer is not None:
            writer.write_step(0, out)
            writer.write_energy(0, np.asarray(out.diag.kin_energy),
                                float(out.diag.pot_energy))

        ke_hist: List[np.ndarray] = [np.asarray(out.diag.kin_energy)]
        pe_hist: List[float] = [float(out.diag.pot_energy)]

        particles = out.particles
        rho_obj = out.rho_obj
        total_lost = 0
        for n in range(1, self.n_time_steps + 1):
            out = self._step_jit(particles, rho_obj)
            particles = out.particles
            rho_obj = out.rho_obj
            ke = np.asarray(out.diag.kin_energy)
            pe = float(out.diag.pot_energy)
            lost = int(out.diag.n_lost)
            if lost:
                total_lost += lost
                msg(WARNING, "step %d: %d particle(s) dropped by migration "
                    "buffer overflow (raise parallel:migrationCap)", n, lost)
            ke_hist.append(ke)
            pe_hist.append(pe)
            if writer is not None:
                writer.write_step(n, out)
                writer.write_energy(n, ke, pe)
            if progress_every and n % progress_every == 0:
                msg(STATUS, "Computing time-step %i (KE=%g PE=%g)",
                    n, ke.sum(), pe)
                if out.obj_potential is not None:
                    for a, pc in enumerate(np.asarray(out.obj_potential)):
                        # "Potential-check" STATUS, src/object.c:338
                        msg(STATUS, "Potential-check for object %d : %f",
                            a, pc)
        jax.block_until_ready(particles.cell)
        wall = time.monotonic() - t_start
        msg(TIMER, "Time spent: %f s (%d steps)", wall, self.n_time_steps)

        self.particles = particles
        self.last_rho_obj = (np.asarray(rho_obj) if rho_obj is not None
                             else None)
        self.last_obj_potential = (np.asarray(out.obj_potential)
                                   if out.obj_potential is not None else None)
        return {
            "kinetic": np.stack(ke_hist),            # (T+1, S)
            "potential": np.asarray(pe_hist),        # (T+1,)
            "wall_time": wall,
        }


# ---------------------------------------------------------------------------
# Run modes (reference: select of methods:mode, src/main.c:32-36)
# ---------------------------------------------------------------------------

@RUN_MODES.register("regular")
def _regular_factory(cfg: PincConfig):
    def run(argv_overrides=()):
        sim = Simulation(cfg)
        writer = None
        if "files:output" in cfg:
            from .io_h5 import OutputWriter
            writer = OutputWriter(cfg, sim)
        try:
            return sim.run(writer=writer)
        finally:
            if writer is not None:
                writer.close()
    return run


@RUN_MODES.register("sMode")
def _s_mode_factory(cfg: PincConfig):
    """Demo spectral-solve mode (sMode, src/spectral.c:127-152): fill a
    sinusoidal rho, solve once, report the error against the analytic
    solution."""
    def run(argv_overrides=()):
        from .grid import fill_sin
        alloc_and_normalize(cfg)
        spec = GridSpec.from_config(cfg)
        solver = SOLVERS.select(cfg, "methods:poisson", default="sSolve")
        rho_np, phi_exact = fill_sin(spec)
        phi = np.asarray(jax.jit(solver)(jnp.asarray(rho_np, dtype=spec.dtype)))
        err = np.sqrt(np.mean((phi - phi_exact) ** 2))
        msg(STATUS, "sMode RMS error vs analytic: %g", err)
        return {"rms_error": err, "phi": phi, "phi_exact": phi_exact}
    return run
