#!/usr/bin/env python3
"""Micro-benchmark of the per-step field glue at the official bench point
(128^3, T=8 -> M from deck): fold_to_global, solver FFT, gradient,
pad_tiles_cmajor, potential_energy — each timed as an in-jit chain
(scan with data dependency) so the ~25-30 ms tunnel dispatch latency
cancels.  Run on the TPU:  python experiments/glue_bench.py [M]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from pinc_tpu.ops import tiled as tl
from pinc_tpu.grid import gradient, potential_energy
from pinc_tpu.solvers.spectral import SpectralSolver

N = 128
M = int(sys.argv[1]) if len(sys.argv) > 1 else 1
ts = tl.TileSpec(grid=(N,) * 3, T=8, M=M, B=128)
P = ts.P
REPS = 50


def chain(op, x0):
    """jit a scan: x -> op(x)-shaped chain with a scalar data dependency."""
    def body(c, _):
        x, s = c
        y = op(x)
        s2 = jnp.sum(y.ravel()[:8])          # tiny dependency
        return (x + 0.0 * s2.astype(x.dtype), s2), ()

    f = jax.jit(lambda x: jax.lax.scan(body, (x, jnp.float32(0)), None,
                                       length=REPS)[0][1])
    y = f(x0)
    jax.block_until_ready(y)
    t0 = time.monotonic()
    y = f(x0)
    jax.block_until_ready(y)
    return (time.monotonic() - t0) / REPS * 1e3


def chain2(op, x0):
    """Chain where op output feeds the next call (same shape)."""
    def body(x, _):
        return op(x), ()
    f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=REPS)[0])
    y = f(x0)
    jax.block_until_ready(y)
    t0 = time.monotonic()
    y = f(x0)
    jax.block_until_ready(y)
    return (time.monotonic() - t0) / REPS * 1e3


rng = np.random.default_rng(0)
print(f"device: {jax.devices()[0]}, grid {N}^3, T=8 M={M} P={P}, "
      f"NT={ts.NT}", file=sys.stderr)

tiles = jnp.asarray(rng.normal(size=(ts.NT, P, P, P)).astype(np.float32))
phi = jnp.asarray(rng.normal(size=(N,) * 3).astype(np.float32))
E = jnp.asarray(rng.normal(size=(N,) * 3 + (3,)).astype(np.float32))
solver = SpectralSolver((N,) * 3)

res = {}
res["fold"] = chain(lambda t: tl.fold_to_global(t, ts), tiles)
res["fft_solve"] = chain2(lambda p: solver(p), phi)
res["gradient"] = chain(lambda p: -gradient(p), phi)
res["pad_cmajor_E"] = chain(lambda e: tl.pad_tiles_cmajor(e, ts), E)
res["grad+pad"] = chain(
    lambda p: tl.pad_tiles_cmajor(-gradient(p), ts), phi)
res["pot_energy"] = chain(lambda p: potential_energy(p, p), phi)
res["full_glue"] = chain(
    lambda t: tl.pad_tiles_cmajor(
        -gradient(solver(tl.fold_to_global(t, ts))), ts), tiles)

for k, v in res.items():
    print(f"{k:16s} {v:7.3f} ms")
