"""Probe: two-level XLA scan (triangular-matmul within 128-chunks +
tiny chunk-carry cumsum) vs plain jnp.cumsum at re-bucket size."""
import sys, time
import jax, jax.numpy as jnp, numpy as np

NT, B = 4096, 9216
C = 128
NC = B // C


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


U = jnp.asarray(np.triu(np.ones((C, C), np.float32)))  # U[c,d]=1 if c<=d


def chunked_cumsum(m):
    """Inclusive cumsum along axis 1 of (NT, B) f32 via batched matmul."""
    m3 = m.reshape(NT, NC, C)
    incl = jax.lax.dot_general(m3, U, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    tot = incl[:, :, -1]
    base = jnp.cumsum(tot, axis=1) - tot          # exclusive, (NT, NC)
    return (incl + base[:, :, None]).reshape(NT, B)


@jax.jit
def two_level(m):
    return chunked_cumsum(m)


@jax.jit
def xla_scan(m):
    return jnp.cumsum(m, axis=1)


# the real consumer: build rank i32 from coord plane + alive
@jax.jit
def rank_build_new(coord, alive, T=8.0, K=128):
    al = alive > 0.5
    lm = (al & (coord < 0.0)).astype(jnp.float32)
    lp = (al & (coord >= T)).astype(jnp.float32)
    rm = chunked_cumsum(lm).astype(jnp.int32) - 1
    rp = chunked_cumsum(lp).astype(jnp.int32) - 1
    lmb, lpb = lm > 0, lp > 0
    rank = jnp.where(lmb & (rm < K), rm,
                     jnp.where(lpb & (rp < K), K + rp, -1)).astype(jnp.int32)
    kill = (lmb & (rm >= K)) | (lpb & (rp >= K))
    return jnp.where(kill, 2 * K, rank)


@jax.jit
def rank_build_old(coord, alive, T=8.0, K=128):
    al = alive > 0.5
    lm = al & (coord < 0.0)
    lp = al & (coord >= T)
    rm = jnp.cumsum(lm.astype(jnp.int32), axis=1) - 1
    rp = jnp.cumsum(lp.astype(jnp.int32), axis=1) - 1
    rank = jnp.where(lm & (rm < K), rm,
                     jnp.where(lp & (rp < K), K + rp, -1)).astype(jnp.int32)
    kill = (lm & (rm >= K)) | (lp & (rp >= K))
    return jnp.where(kill, 2 * K, rank)


def unused_main():
    k = jax.random.PRNGKey(0)
    m = (jax.random.uniform(k, (NT, B)) < 0.01).astype(jnp.float32)
    coord = jax.random.uniform(jax.random.PRNGKey(1), (NT, B),
                               minval=-0.5, maxval=8.5)
    alive = (jax.random.uniform(jax.random.PRNGKey(2), (NT, B)) < 0.9
             ).astype(jnp.float32)
    print("device:", jax.devices()[0], flush=True)
    print("scan err:", float(jnp.max(jnp.abs(two_level(m) - xla_scan(m)))),
          flush=True)
    print("rank err:", int(jnp.max(jnp.abs(
        rank_build_new(coord, alive) - rank_build_old(coord, alive)))),
        flush=True)
    for name, f, args in [("two_level scan", two_level, (m,)),
                          ("xla cumsum", xla_scan, (m,)),
                          ("rank new", rank_build_new, (coord, alive)),
                          ("rank old", rank_build_old, (coord, alive))]:
        dt, _ = timeit(f, *args)
        print(f"{name:16s} {dt*1e3:8.2f} ms", flush=True)


# chained (amortizes the ~28 ms tunnel dispatch latency)
@jax.jit
def rank_new_chain(coord, alive):
    out = None
    for i in range(8):
        r = rank_build_new(coord, alive)
        coord = coord + 1e-6 * r.astype(jnp.float32)
        out = r
    return out, coord


@jax.jit
def rank_old_chain(coord, alive):
    out = None
    for i in range(8):
        r = rank_build_old(coord, alive)
        coord = coord + 1e-6 * r.astype(jnp.float32)
        out = r
    return out, coord


def chained():
    coord = jax.random.uniform(jax.random.PRNGKey(1), (NT, B),
                               minval=-0.5, maxval=8.5)
    alive = (jax.random.uniform(jax.random.PRNGKey(2), (NT, B)) < 0.9
             ).astype(jnp.float32)
    for name, f in [("rank new x8", rank_new_chain),
                    ("rank old x8", rank_old_chain)]:
        dt, _ = timeit(f, coord, alive)
        print(f"{name:16s} {dt/8*1e3:8.2f} ms/build", flush=True)


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    chained()
