"""Nanosecond-accumulating timer — the reference's ``Timer``
(src/core.h:439-442; tAlloc/tStart/tStop/tMsg, src/aux.c:48-89) plus a
device-aware variant that blocks on JAX async dispatch so intervals measure
real device work, and an optional ``jax.profiler`` trace context."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

from .logging import TIMER, msg


class Timer:
    """Accumulating wall timer.  ``total`` is in nanoseconds like the
    reference's ``Timer.total``."""

    def __init__(self, rank: int = 0):
        self.total = 0          # ns
        self._start: Optional[int] = None
        self.rank = rank

    def start(self) -> None:                    # tStart
        self._start = time.perf_counter_ns()

    def stop(self) -> None:                     # tStop
        if self._start is not None:
            self.total += time.perf_counter_ns() - self._start
            self._start = None

    def reset(self) -> None:                    # tReset
        self.total = 0
        self._start = None

    def msg(self, fmt: str = "Time spent: %s") -> None:     # tMsg
        msg(TIMER, fmt, f"{self.total / 1e9:.6f} s")


class DeviceTimer(Timer):
    """Blocks on the given arrays before reading the clock, so the
    interval covers actual device execution (JAX dispatch is async)."""

    def stop_on(self, *arrays) -> None:
        import jax
        jax.block_until_ready(arrays)
        self.stop()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context (the rebuild's answer to the reference's
    gprof workflow, doc/introduction/main.tex:568)."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
