"""TPU per-stage benchmark of the Pallas PIC kernels at production size:
deposit and gather at 128^3, one species slab (NT=4096 tiles, B=12288),
swept over margin M (P = T+1+2M) and MXU dtype.

Timing discipline (memory: replay-cache + dispatch traps): each rep runs
inside one lax.scan whose carry evolves (lpos drifts) and whose output is
consumed into a scalar accumulator, so no iteration can be cached or DCEd.

Usage: python script/bench_kernels_tpu.py [reps]
"""
import itertools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

from pinc_tpu.ops import pallas_tiled as ptl  # noqa: E402
from pinc_tpu.ops import tiled as tl  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chain(f, lpos, vel, reps):
    """Time reps sequential calls f(lpos) with drifting lpos."""
    def body(carry, _):
        lp, acc = carry
        out = f(lp)
        return (lp + vel, acc + jnp.sum(out)), None

    @jax.jit
    def run(lp):
        (lp, acc), _ = jax.lax.scan(body, (lp, jnp.zeros(())), None,
                                    length=reps)
        return acc

    acc = run(lpos)            # compile + warm
    jax.block_until_ready(acc)
    t0 = time.monotonic()
    acc = run(lpos)
    jax.block_until_ready(acc)
    return (time.monotonic() - t0) / reps, float(acc)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    T, B, fill = 8, 12288, 8192
    NT = (128 // T) ** 3
    lpos = jnp.asarray(rng.uniform(0, T, size=(NT, B, 3)).astype(np.float32))
    vel = jnp.asarray(rng.normal(0, 0.004, size=(NT, B, 3))
                      .astype(np.float32))
    alive = np.zeros((NT, B), np.float32)
    alive[:, :fill] = 1.0
    value = jnp.asarray(alive)

    for M, dt in itertools.product((2, 1), (jnp.float32, jnp.bfloat16)):
        ts = tl.TileSpec(grid=(128, 128, 128), T=T, M=M, B=B, chunk=32)
        P = ts.P
        dname = "bf16" if dt == jnp.bfloat16 else "f32"
        slot_ns = lambda s: s * 1e9 / (NT * B)

        f_dep = lambda lp: ptl.deposit(lp, value, ts, mxu_dtype=dt)
        s, acc = timed_chain(f_dep, lpos, vel, reps)
        log(f"M={M} P={P} {dname}: deposit {s*1e3:7.1f} ms "
            f"({slot_ns(s):.2f} ns/slot)  sum={acc:.3e}")

        E = jnp.asarray(rng.normal(size=(NT, P, P, P, 3))
                        .astype(np.float32))
        f_gat = lambda lp: ptl.gather(E, lp, ts, mxu_dtype=dt)
        s, acc = timed_chain(f_gat, lpos, vel, reps)
        log(f"M={M} P={P} {dname}: gather  {s*1e3:7.1f} ms "
            f"({slot_ns(s):.2f} ns/slot)  sum={acc:.3e}")

    # fold cost (deposit_to_grid - deposit)
    ts = tl.TileSpec(grid=(128, 128, 128), T=T, M=2, B=B, chunk=32)
    tiles = ptl.deposit(lpos, value, ts)
    tiles = tiles.reshape((NT,) + (ts.P,) * 3)

    def body(carry, _):
        t, acc = carry
        g = tl.fold_to_global(t, ts)
        return (t * 1.000001, acc + jnp.sum(g)), None

    @jax.jit
    def run_fold(t):
        (t, acc), _ = jax.lax.scan(body, (t, jnp.zeros(())), None,
                                   length=reps)
        return acc

    acc = run_fold(tiles); jax.block_until_ready(acc)
    t0 = time.monotonic()
    acc = run_fold(tiles); jax.block_until_ready(acc)
    log(f"fold_to_global (M=2): {(time.monotonic()-t0)/reps*1e3:.1f} ms")

    # pad_tiles cost (the gather-side field prep)
    Eg = jnp.asarray(rng.normal(size=(128, 128, 128, 3)).astype(np.float32))

    def body2(carry, _):
        e, acc = carry
        ep = tl.pad_tiles(e, ts)
        return (e * 1.000001, acc + jnp.sum(ep)), None

    @jax.jit
    def run_pad(e):
        (e, acc), _ = jax.lax.scan(body2, (e, jnp.zeros(())), None,
                                   length=reps)
        return acc

    acc = run_pad(Eg); jax.block_until_ready(acc)
    t0 = time.monotonic()
    acc = run_pad(Eg); jax.block_until_ready(acc)
    log(f"pad_tiles (M=2): {(time.monotonic()-t0)/reps*1e3:.1f} ms")


if __name__ == "__main__":
    main()
