"""Small typed-array helpers — the parity surface for the reference's
ad*/ai*/al* micro-library (``src/aux.h:157-305``, impls src/aux.c:125-467).

Almost everything the C library hand-rolls (add/mul/scale/shift/min/max/
sum/avg/prod/dot/cumsum/cumprod/eq/set/print) is a one-line numpy/jnp
expression here, so this module only keeps the few helpers with PINC-
specific semantics plus thin aliases documenting the correspondence; new
code should use numpy/jnp directly.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def cum_sum(arr: Sequence[float | int]) -> np.ndarray:
    """Inclusive cumulative sum (adCumSum/alCumSum)."""
    return np.cumsum(np.asarray(arr))


def cum_prod(arr: Sequence[float | int]) -> np.ndarray:
    """Inclusive cumulative product (aiCumProd/alCumProd).  The reference
    uses the *exclusive-with-leading-1* variant for sizeProd
    (gAlloc, src/grid.c:430-436): use :func:`size_prod` for that."""
    return np.cumprod(np.asarray(arr))


def size_prod(size: Sequence[int]) -> np.ndarray:
    """[1, s0, s0*s1, ...] — the reference Grid's sizeProd layout helper."""
    return np.concatenate([[1], np.cumprod(np.asarray(size, dtype=np.int64))])


def normal(v: Sequence[float]) -> np.ndarray:
    """Unit normal of a vector (adNormal, src/aux.c:304-313)."""
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def reflect(v: Sequence[float], n: Sequence[float]) -> np.ndarray:
    """Reflect v about the plane with unit normal n
    (adReflect, src/aux.c:315-324): v - 2 (v.n) n."""
    v = np.asarray(v, dtype=np.float64)
    n = normal(n)
    return v - 2.0 * np.dot(v, n) * n


def eq(a, b, tol: float = 0.0) -> bool:
    """Elementwise equality within tol (adEq/aiEq)."""
    return bool(np.all(np.abs(np.asarray(a) - np.asarray(b)) <= tol))
