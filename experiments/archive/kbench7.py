"""Probe: in-kernel lane prefix sum over a (G, B) block — does it compile
and what does it cost vs the XLA cumsum?"""
import sys, time
from functools import partial
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT, B = 4096, 9216
G = 8


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))
    return x


def timeit(f, *args, n=5, warmup=2):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    return (time.perf_counter() - t0) / n, out


def _prefix_lanes(x):
    """Inclusive prefix sum along the lane axis of (G, B) f32."""
    b = x.shape[-1]
    s = 1
    while s < b:
        shifted = jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (s,), x.dtype), x[..., :-s]], axis=-1)
        x = x + shifted
        s *= 2
    return x


def _scan_kernel(m_ref, out_ref):
    out_ref[...] = _prefix_lanes(m_ref[...])


@jax.jit
def pallas_scan(m):
    return pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((NT, B), jnp.float32),
        grid=(NT // G,),
        in_specs=[pl.BlockSpec((G, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(m)


@jax.jit
def xla_scan(m):
    return jnp.cumsum(m, axis=1)


if __name__ == "__main__":
    k = jax.random.PRNGKey(0)
    m = (jax.random.uniform(k, (NT, B)) < 0.01).astype(jnp.float32)
    print("device:", jax.devices()[0], flush=True)
    out_p = pallas_scan(m)
    out_x = xla_scan(m)
    print("max err:", float(jnp.max(jnp.abs(out_p - out_x))), flush=True)
    dt, _ = timeit(pallas_scan, m)
    print(f"pallas scan: {dt*1e3:8.2f} ms", flush=True)
    dt, _ = timeit(xla_scan, m)
    print(f"xla cumsum:  {dt*1e3:8.2f} ms", flush=True)
