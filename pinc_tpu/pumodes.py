"""Single-particle verification run modes.

The reference *declares* ``puModeParticle``/``puModeInterp``
(src/pusher.h:192-195) and ships verification scripts for them
(verification/puModeParticle.py), but never implemented the modes — the
scripts are aspirational (SURVEY.md §4.3).  Implemented here for real:

* ``puModeParticle`` — trajectory convergence: one particle in a harmonic
  electric field E = -k (x - x0) sampled on the grid (CIC reconstruction of
  a linear field is exact, so the measured error isolates the *time
  integrator*).  The leapfrog trajectory is compared against the analytic
  oscillation over a range of timesteps; the expected convergence order
  is 2.

* ``puModeInterp`` — interpolation convergence: gather a sinusoidal E at
  off-grid positions with NGP and CIC and compare to the exact field over
  a range of grid resolutions; expected orders ~1 (NGP) and ~2 (CIC).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import PincConfig
from .ops import cic, pusher
from .population import Particles, SpeciesParams
from .registry import RUN_MODES
from .utils.logging import STATUS, msg


def _single_particle(x0: float, v0: float, dtype=jnp.float32) -> Particles:
    cell = np.floor([[[x0]]]).astype(np.int32)
    frac = np.asarray([[[x0]]]) - cell
    return Particles(cell=jnp.asarray(cell),
                     frac=jnp.asarray(frac, dtype=dtype),
                     vel=jnp.asarray([[[v0]]], dtype=dtype),
                     alive=jnp.asarray([[True]]))


def particle_convergence(L: int = 64, n_periods: float = 2.0,
                         dts: tuple = (0.2, 0.1, 0.05, 0.025)) -> Dict:
    """Leapfrog-vs-analytic error for a harmonic well at decreasing dt.

    Field (per unit dt): E = -k (x - L/2) with q=m=1, so omega = sqrt(k).
    dt enters through the per-step kick scale k*dt^2 (dx=dt=1 internally;
    changing 'dt' rescales k exactly like the reference decks rescale
    time:timeStep).
    """
    params = SpeciesParams(charge=jnp.asarray([1.0]), mass=jnp.asarray([1.0]))
    x0 = L / 2.0 + L / 8.0
    amp = L / 8.0
    errors = []
    for dt in dts:
        omega = dt                      # omega*dt_step = dt (one cell/step)
        k = omega ** 2
        xs = np.arange(L, dtype=np.float64)
        E = jnp.asarray((-k * (xs - L / 2.0))[:, None], dtype=jnp.float32)
        p = _single_particle(x0, 0.0)
        p, _ = pusher.acc_leapfrog(p, params, 0.5 * E)
        n_steps = int(round(2 * np.pi * n_periods / omega))
        traj = np.empty(n_steps + 1)
        traj[0] = x0
        for i in range(n_steps):
            p = pusher.move(p, (L,))
            p, _ = pusher.acc_leapfrog(p, params, E)
            traj[i + 1] = float(np.asarray(p.pos())[0, 0, 0])
        t = np.arange(n_steps + 1) * omega
        exact = L / 2.0 + amp * np.cos(t)
        err = np.sqrt(np.mean((traj - exact) ** 2)) / amp
        errors.append(err)
        msg(STATUS, "puModeParticle: dt=%g -> rms trajectory error %g",
            dt, err)
    orders = [float(np.log2(errors[i] / errors[i + 1]))
              for i in range(len(errors) - 1)]
    msg(STATUS, "puModeParticle: measured orders %s (expect ~2)",
        ["%.2f" % o for o in orders])
    return {"dts": list(dts), "errors": errors, "orders": orders}


def interp_convergence(sizes: tuple = (16, 32, 64, 128),
                       n_samples: int = 4096) -> Dict:
    """NGP vs CIC gather error against an exact sinusoidal field."""
    rng = np.random.default_rng(0)
    out = {"sizes": list(sizes), "ngp": [], "cic": []}
    for L in sizes:
        xs = np.arange(L, dtype=np.float64)
        k = 2.0 * np.pi / L
        E_grid = jnp.asarray(np.sin(k * xs)[:, None], dtype=jnp.float32)
        pos = rng.uniform(0, L, n_samples)
        cell = jnp.asarray(np.floor(pos).astype(np.int32)[:, None])
        frac = jnp.asarray((pos - np.floor(pos)).astype(np.float32)[:, None])
        exact = np.sin(k * pos)
        e_cic = np.asarray(cic.gather_cic(E_grid, cell, frac))[:, 0]
        e_ngp = np.asarray(cic.gather_ngp(E_grid, cell, frac))[:, 0]
        out["cic"].append(float(np.sqrt(np.mean((e_cic - exact) ** 2))))
        out["ngp"].append(float(np.sqrt(np.mean((e_ngp - exact) ** 2))))
        msg(STATUS, "puModeInterp: L=%d ngp=%g cic=%g", L,
            out["ngp"][-1], out["cic"][-1])
    out["order_ngp"] = float(np.log2(out["ngp"][0] / out["ngp"][1]))
    out["order_cic"] = float(np.log2(out["cic"][0] / out["cic"][1]))
    msg(STATUS, "puModeInterp: measured orders ngp=%.2f cic=%.2f "
        "(expect ~1 / ~2)", out["order_ngp"], out["order_cic"])
    return out


@RUN_MODES.register("puModeParticle")
def _pu_particle_factory(cfg: PincConfig):
    def run(argv_overrides=()):
        L = cfg.get_int("grid:truesize", 64)
        return particle_convergence(L=L)
    return run


@RUN_MODES.register("puModeInterp")
def _pu_interp_factory(cfg: PincConfig):
    def run(argv_overrides=()):
        return interp_convergence()
    return run
