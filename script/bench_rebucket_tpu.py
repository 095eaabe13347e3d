"""TPU micro-benchmark: re-bucket implementations at production size
(128^3 tiles, one species of 33.5M live particles, bucket B=12288).

Compares: the fused plane exchange (ops/pallas_exchange) across K and
the lax.sort re-bucket.
All data generated on device (the axon tunnel uploads at WAN speed).
Run alone — never alongside another TPU process.

Usage: python script/bench_rebucket_tpu.py [mode ...]
  modes: v2k128 v2k256 v2k512 sort   (default: v2k256 v2k512 sort)
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

from pinc_tpu.ops import pallas_exchange as pex  # noqa: E402
from pinc_tpu.ops import tiled as tl  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


T, B, FILL = 8, 12288, 8192
NT = (128 // T) ** 3
TS = tl.TileSpec(grid=(128, 128, 128), T=T, M=2, B=B, chunk=32)


@jax.jit
def gen():
    k = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(k)
    lp = jax.random.uniform(k1, (3, NT, B), jnp.float32, 0.0, float(T))
    # velocity scaled to one-cadence accumulated drift (sigma 0.084 cells)
    vel = 0.084 * jax.random.normal(k2, (3, NT, B), jnp.float32)
    alive = jnp.broadcast_to(jnp.arange(B)[None, :] < FILL, (NT, B))
    return lp, vel, alive.astype(jnp.float32)


def timed(name, step, lp, vel, al, reps=3):
    """step(lp, vel, al) -> (lp, vel, al, dropped).  Timed inside ONE
    jitted scan (push+step per iteration, outputs consumed) — externally
    chained calls read ~0.1 ms through the relay's lazy dispatch."""
    def run(lp, vel, al):
        def body(carry, _):
            lp, vel, al, dd = carry
            lp2, vel2, al2, d = step(lp + vel, vel, al)
            return (lp2, vel2, al2, dd + d), None
        (lp, vel, al, dd), _ = jax.lax.scan(
            body, (lp, vel, al, jnp.zeros((), jnp.int32)), None,
            length=reps)
        return lp, al, dd

    rj = jax.jit(run)
    try:
        lp1, al1, dd = rj(lp, vel, al)
        jax.block_until_ready(lp1)
    except Exception as e:  # noqa: BLE001
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")
        return
    # timed call takes the warmup's OUTPUT as input: an identical
    # (program, args) pair would hit the relay replay cache (0.1 ms reads)
    t0 = time.monotonic()
    lp2, al2, dd = rj(lp1, vel, al1)
    jax.block_until_ready(lp2)
    al1, dd = al2, dd
    ms = (time.monotonic() - t0) / reps * 1e3
    log(f"{name}: {ms:7.1f} ms/call  alive={int(jnp.sum(al1 > 0.5)):,} "
        f"dropped={int(dd)}")


def v2_step(K):
    def step(lp, vel, al):
        planes = tuple(lp[d] for d in range(3)) + tuple(
            vel[d] for d in range(3))
        planes, al2, d = pex.rebucket_exchange_planes(
            planes, al, TS.ntiles, TS.T, K=K)
        return (jnp.stack(planes[:3]), jnp.stack(planes[3:]), al2, d)
    return step


def sort_step(lp, vel, al):
    gpos = tl.global_positions(jnp.moveaxis(lp, 0, -1), TS).reshape(-1, 3)
    v = jnp.moveaxis(vel, 0, -1).reshape(-1, 3)
    lp2, v2, al2, d = tl.bucket(gpos, v, (al > 0.5).reshape(-1), TS)
    return (jnp.moveaxis(lp2, -1, 0), jnp.moveaxis(v2, -1, 0),
            al2.astype(jnp.float32), d)


def main():
    modes = sys.argv[1:] or ["v2k256", "v2k512", "sort"]
    log(f"device: {jax.devices()[0]}")
    lp, vel, al = gen()
    jax.block_until_ready(lp)
    log(f"NT={NT} B={B} fill={FILL} (device data ready)")
    for m in modes:
        if m.startswith("v2k"):
            timed(f"v2 exchange K={m[3:]}", v2_step(int(m[3:])), lp, vel, al)
        elif m == "sort":
            timed("sort rebucket", sort_step, lp, vel, al)


if __name__ == "__main__":
    main()
