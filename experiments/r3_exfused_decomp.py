#!/usr/bin/env python3
"""Per-kernel decomposition of the fused (v5) vs per-dim (v4) exchange at
the production margin-2 point.  Chained in-jit timings (the tunnel adds
~25 ms dispatch per call); a scalar carry creates the serial dependence."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.tiled_sim import _jit
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

NT, B, T = 4096, 18432, 8
NTILES = (16, 16, 16)
Ks = 128
Ke = pex.default_edge_cap(Ks)
REPS = 8

rng = np.random.default_rng(0)
planes = tuple(jnp.asarray(
    rng.uniform(-1.5, T + 1.5, (NT, B)).astype(np.float32))
    for _ in range(6))
alive = jnp.asarray((rng.uniform(size=(NT, B)) < 0.89).astype(np.float32))
bufs0 = jnp.asarray(rng.normal(size=(NT, 8, 8 * 6 * Ks)).astype(np.float32))
inc0 = jnp.asarray(rng.normal(size=(NT, 8, 8 * 2 * Ks)).astype(np.float32))

roll = lambda a, s, ax: jnp.roll(a, s, axis=ax)


def timeit(name, f, *args):
    @_jit
    def run(*a):
        def body(c, _):
            return f(c, *a), ()
        return jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0]
    o = run(*args)
    jax.block_until_ready(o)
    t0 = time.monotonic()
    o = run(*args)
    jax.block_until_ready(o)
    dt = (time.monotonic() - t0) / REPS
    print(f"{name:32s}: {dt*1e3:8.1f} ms", flush=True)


def f_extract_all(c, *a):
    pl6 = (a[0] + c * 1e-20,) + a[1:6]
    bufs, al2 = pex.extract_all_rows(pl6, a[6], Ks, T)
    return bufs[0, 0, 0] * 1e-12 + al2[0, 0] * 1e-12


def f_extract_v4(c, *a):
    pl6 = (a[0] + c * 1e-20,) + a[1:6]
    bufs, al2 = pex.extract_rows(pl6[0], a[6], pl6, Ks, T)
    return bufs[0, 0, 0] * 1e-12 + al2[0, 0] * 1e-12


def f_cleanup(c, inc):
    s, ex = pex.cleanup_rows(inc + c * 1e-20, 2 * Ks, Ke, T, axes=(1, 2))
    return s[0, 0, 0] * 1e-12 + ex[0][0, 0, 0] * 1e-12


blocks = []
off = 0
for w in (2 * Ks, 2 * (Ks + Ke), Ks, Ke, Ke, Ks, Ke, Ke):
    blocks.append((off, w))
    off += w
KT = off
incm = jnp.asarray(rng.normal(size=(NT, 8, 8 * KT)).astype(np.float32))


def f_merge_all(c, al, inc, *pl6):
    ps, al2 = pex.merge_all_rows(al, inc + c * 1e-20, pl6, tuple(blocks))
    return ps[0][0, 0] * 1e-12 + al2[0, 0] * 1e-12


def f_merge_v4(c, al, inc, *pl6):
    ps, al2 = pex.merge_rows(al, inc + c * 1e-20, pl6, Ks)
    return ps[0][0, 0] * 1e-12 + al2[0, 0] * 1e-12


def f_glue(c, bufs):
    nt = NTILES
    b = (bufs + c * 1e-20).reshape(nt + (8, 8, 6, Ks))
    face = [b[..., i, :].reshape(NT, 8, 8 * Ks) for i in range(6)]

    def cat(bl):
        parts = [bb.reshape(nt + (8, 8, -1)) for bb in bl]
        return jnp.concatenate(parts, axis=-1).reshape(NT, 8, -1)

    inc_x = cat([pex._roll_blocked(face[0], nt, 8, Ks, 0, -1, roll),
                 pex._roll_blocked(face[1], nt, 8, Ks, 0, 1, roll)])
    inc_y = cat([pex._roll_blocked(face[2], nt, 8, Ks, 1, -1, roll),
                 pex._roll_blocked(face[3], nt, 8, Ks, 1, 1, roll)])
    inc_x = pex._shift_rows(inc_x, 8, ((Ks, 1), (Ks, -1)), 0, T)
    return inc_x[0, 0, 0] * 1e-12 + inc_y[0, 0, 0] * 1e-12


timeit("extract_all (v5)", f_extract_all, *planes, alive)
timeit("extract_rows (v4) x1", f_extract_v4, *planes, alive)
timeit("cleanup_x (v5)", f_cleanup, inc0)
timeit("merge_all (v5)", f_merge_all, alive, incm, *planes)
timeit("merge_rows (v4) x1", f_merge_v4, alive, inc0, *planes)
timeit("buffer glue (rolls+concat+shift)", f_glue, bufs0)
