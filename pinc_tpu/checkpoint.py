"""Checkpoint / resume.

The reference has no real restart mechanism: fields can be re-read from the
per-step grid datasets (``gReadH5``, src/grid.c:1183-1202) and the ini files
carry a ``time:startTime`` key "in case of continuing a simulation"
(test.ini:21), but nothing consumes it and there is no particle-state
restore (SURVEY.md §5 'Checkpoint / resume').  Here resume is real and
cheap: the full simulation state (particle slabs, persistent object charge,
step counter, energy history tail) goes to one HDF5 file per checkpoint,
``<prefix><sep>checkpoint.chk.h5``, with datasets per species and the step
number as an attribute.

Enabled by deck keys:

* ``files:checkpointEvery = N``  — write every N steps (0 = off, final
  state is always written when enabled).
* ``time:startTime`` > 0 or CLI ``--resume`` — restore from the checkpoint
  file and continue the step numbering.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from .config import PincConfig
from .io_h5 import h5_path
from .population import Particles
from .utils.logging import STATUS, WARNING, msg

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def checkpoint_path(cfg: PincConfig) -> Path:
    return h5_path(cfg, "checkpoint", "chk")


def save(cfg: PincConfig, step: int, particles: Particles,
         rho_obj: Optional[np.ndarray] = None) -> Path:
    from .utils.multihost import fetch_global, is_primary

    path = checkpoint_path(cfg)
    # multi-host: state is all-gathered and process 0 writes the single
    # file (the reference's collective MPI-IO, src/population.c:538-651,
    # as fetch-to-primary; every process returns the same path and a
    # shared filesystem is assumed, as MPI-IO assumes)
    cell = fetch_global(particles.cell)
    frac = fetch_global(particles.frac)
    vel = fetch_global(particles.vel)
    alive = fetch_global(particles.alive)
    rho_np = None if rho_obj is None else fetch_global(rho_obj)
    if not is_primary():
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["step"] = int(step)
        f.attrs["format_version"] = 1
        f.create_dataset("cell", data=cell)
        f.create_dataset("frac", data=frac)
        f.create_dataset("vel", data=vel)
        f.create_dataset("alive", data=alive)
        if rho_np is not None:
            f.create_dataset("rho_obj", data=rho_np)
    msg(STATUS, "checkpoint written: %s (step %d)", path, step)
    return path


def load(cfg: PincConfig) -> Tuple[int, Particles, Optional[np.ndarray]]:
    import jax.numpy as jnp

    path = checkpoint_path(cfg)
    if not path.exists():
        raise FileNotFoundError(f"no checkpoint at {path}")
    with h5py.File(path, "r") as f:
        if f.attrs.get("layout", "flat") != "flat":
            raise ValueError(
                f"{path} is a {f.attrs['layout']!r}-layout checkpoint; "
                "resume it with the matching methods:layout")
        step = int(f.attrs["step"])
        particles = Particles(
            cell=jnp.asarray(np.asarray(f["cell"])),
            frac=jnp.asarray(np.asarray(f["frac"])),
            vel=jnp.asarray(np.asarray(f["vel"])),
            alive=jnp.asarray(np.asarray(f["alive"])))
        rho_obj = np.asarray(f["rho_obj"]) if "rho_obj" in f else None
    msg(STATUS, "checkpoint restored: %s (step %d)", path, step)
    return step, particles, rho_obj


def peek_layout(cfg: PincConfig) -> Optional[str]:
    """Layout tag of the on-disk checkpoint ('flat'/'tiled'), or None if
    no checkpoint exists."""
    path = checkpoint_path(cfg)
    if not path.exists():
        return None
    with h5py.File(path, "r") as f:
        return str(f.attrs.get("layout", "flat"))


def save_tiled(cfg: PincConfig, step: int, state,
               rho_obj: Optional[np.ndarray] = None) -> Path:
    """Tiled-layout checkpoint: the (S, D, NT, B) component planes are
    stored verbatim (slot assignment included), so a resumed run replays
    the original bit-for-bit — converting through the flat Particles
    layout would re-bucket on restore and reorder the per-tile
    summation, perturbing the deposit in the last float bit."""
    from .utils.multihost import fetch_global, is_primary

    path = checkpoint_path(cfg)
    lpos = fetch_global(state.lpos)
    vel = fetch_global(state.vel)
    alive = fetch_global(state.alive)
    rho_np = None if rho_obj is None else fetch_global(rho_obj)
    if not is_primary():
        return path
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["step"] = int(step)
        f.attrs["format_version"] = 1
        f.attrs["layout"] = "tiled"
        f.create_dataset("lpos", data=lpos)
        f.create_dataset("vel", data=vel)
        f.create_dataset("alive", data=alive)
        if rho_obj is not None:
            f.create_dataset("rho_obj", data=rho_np)
    msg(STATUS, "checkpoint written: %s (step %d, tiled)", path, step)
    return path


def load_tiled(cfg: PincConfig, expect_shape=None):
    """-> (step, TiledState with flat (S, D, NT, B) axes, rho_obj)."""
    import jax.numpy as jnp
    from .tiled_sim import TiledState

    path = checkpoint_path(cfg)
    if not path.exists():
        raise FileNotFoundError(f"no checkpoint at {path}")
    with h5py.File(path, "r") as f:
        if f.attrs.get("layout", "flat") != "tiled":
            raise ValueError(
                f"{path} is a {f.attrs.get('layout', 'flat')!r}-layout "
                "checkpoint; resume it with the matching methods:layout")
        step = int(f.attrs["step"])
        lpos = np.asarray(f["lpos"])
        if expect_shape is not None and lpos.shape != tuple(expect_shape):
            raise ValueError(
                f"checkpoint state shape {lpos.shape} != deck-derived "
                f"{tuple(expect_shape)} — the [tiles] section (tileSize/"
                "margin/slack) or the population capacity changed since "
                "the checkpoint was written")
        state = TiledState(lpos=jnp.asarray(lpos),
                           vel=jnp.asarray(np.asarray(f["vel"])),
                           alive=jnp.asarray(np.asarray(f["alive"])))
        rho_obj = np.asarray(f["rho_obj"]) if "rho_obj" in f else None
    msg(STATUS, "checkpoint restored: %s (step %d, tiled)", path, step)
    return step, state, rho_obj
