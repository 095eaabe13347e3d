from . import multigrid, spectral  # noqa: F401
