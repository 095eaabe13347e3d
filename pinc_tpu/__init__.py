"""pinc_tpu — a TPU-native electrostatic Particle-in-Cell framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
C/MPI code PINC (see SURVEY.md): multi-species leapfrog/Boris particle push
with NGP/CIC gather-scatter, spectral (ND FFT) and geometric multigrid
Poisson solvers, domain decomposition via ``jax.sharding`` meshes with
collective halo exchange, embedded conducting objects via the
capacitance-matrix method, PINC-compatible ini decks and HDF5 output.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even on hosts whose sitecustomize pins the platform
# list via jax.config at interpreter start (which silently overrides the
# environment variable — a "CPU" run would otherwise grab the real TPU
# and collide with whatever benchmark owns it).  Only applies while the
# config still holds the sitecustomize default, so explicit programmatic
# jax.config.update() calls (e.g. tests/conftest.py) always win, and the
# ambient JAX_PLATFORMS=axon of the host never re-pins anything.
import os as _os

_want = _os.environ.get("JAX_PLATFORMS")
if _want:
    try:
        import jax as _jax

        _cur = _jax.config.jax_platforms
        if _cur != _want and (_cur or "") .startswith("axon") \
                and not _want.startswith("axon"):
            _jax.config.update("jax_platforms", _want)
    except Exception:  # pragma: no cover — backend already initialized
        pass

from .config import PincConfig, required_np
from .grid import BndType, GridSpec
from .population import Particles, SpeciesParams, initialize
from .simulation import Simulation
from .units import Units, alloc_and_normalize

__all__ = [
    "PincConfig", "required_np", "GridSpec", "BndType", "Particles",
    "SpeciesParams", "initialize", "Simulation", "Units",
    "alloc_and_normalize",
]
