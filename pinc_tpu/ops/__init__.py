from . import cic, pusher  # noqa: F401
