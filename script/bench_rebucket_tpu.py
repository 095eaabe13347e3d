"""TPU micro-benchmark: exchange re-bucket (selection matmuls) vs sort
re-bucket at production size (128^3 tiles, one species of 33.5M particles,
bucket B=12288).  Run alone — never alongside another TPU process.

Usage: python script/bench_rebucket_tpu.py [Ks...]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

from pinc_tpu.ops import tiled as tl  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    ts = tl.TileSpec(grid=(128, 128, 128), T=8, M=2, B=12288, chunk=32)
    NT, B = ts.NT, ts.B
    rng = np.random.default_rng(0)
    fill = 8192  # particles per tile (16 ppc)
    lpos = rng.uniform(0.0, 8.0, size=(NT, B, 3)).astype(np.float32)
    # velocities scaled so one push makes a realistic leaver fraction
    # (~cadence-21 accumulated drift: sigma 0.084 cells -> here one push)
    vel = rng.normal(0.0, 0.084, size=(NT, B, 3)).astype(np.float32)
    alive = np.zeros((NT, B), bool)
    alive[:, :fill] = True
    lpos = jnp.asarray(lpos)
    vel = jnp.asarray(vel)
    alive = jnp.asarray(alive)
    leave_frac = float(np.mean(
        (np.asarray(lpos[:4]) + np.asarray(vel[:4]) < 0).any(-1)
        | (np.asarray(lpos[:4]) + np.asarray(vel[:4]) >= 8).any(-1)))
    log(f"NT={NT} B={B} fill={fill} leaver-fraction~{leave_frac:.4f} "
        f"(~{leave_frac*fill:.0f}/tile)")

    Ks = [int(k) for k in sys.argv[1:]] or [512, 1024, 3072]
    reps = 3
    for K in Ks:
        def push_rb(carry, _):
            lp, v, al = carry
            lp = lp + v
            lp2, v2, al2, d = tl.rebucket_exchange(lp, v, al, ts, K=K)
            return (lp2, v2, al2), d

        @jax.jit
        def run(lp, v, al):
            (lp, v, al), ds = jax.lax.scan(push_rb, (lp, v, al),
                                           None, length=reps)
            return lp, v, al, ds

        t0 = time.monotonic()
        lp2, v2, al2, ds = run(lpos, vel, alive)
        jax.block_until_ready(lp2)
        log(f"K={K}: compile+run {time.monotonic()-t0:.1f}s "
            f"dropped={np.asarray(ds).tolist()} "
            f"alive={int(np.asarray(al2).sum())}")
        t0 = time.monotonic()
        lp2, v2, al2, ds = run(lp2, v2, al2)
        jax.block_until_ready(lp2)
        dt = (time.monotonic() - t0) / reps
        log(f"K={K}: exchange rebucket+push {dt*1e3:.1f} ms/call "
            f"dropped={np.asarray(ds).tolist()}")

    # sort re-bucket reference at the same size
    def sort_rb(carry, _):
        lp, v, al = carry
        lp = lp + v
        gpos = tl.global_positions(lp, ts).reshape(-1, 3)
        lp2, v2, al2, d = tl.bucket(gpos, v.reshape(-1, 3),
                                    al.reshape(-1), ts)
        return (lp2, v2, al2), d

    @jax.jit
    def run_sort(lp, v, al):
        (lp, v, al), ds = jax.lax.scan(sort_rb, (lp, v, al), None, length=2)
        return lp, v, al, ds

    t0 = time.monotonic()
    lp2, v2, al2, ds = run_sort(lpos, vel, alive)
    jax.block_until_ready(lp2)
    log(f"sort: compile+run {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    lp2, v2, al2, ds = run_sort(lp2, v2, al2)
    jax.block_until_ready(lp2)
    log(f"sort rebucket+push {(time.monotonic()-t0)/2*1e3:.1f} ms/call "
        f"dropped={np.asarray(ds).tolist()}")


if __name__ == "__main__":
    main()
