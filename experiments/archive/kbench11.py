"""TPU conservation check for the exchange: isolate which change leaks
particles (rank build / transposed extract / merge skip)."""
import sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.ops import pallas_exchange as pex

NT, B, T, K = 4096, 9216, 8, 256
nt = (16, 16, 16)

k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 8)
# positions mostly inside, ~1% leavers per face
planes = tuple(
    jax.random.uniform(ks[i], (NT, B), jnp.float32, -0.15, T + 0.15)
    if i < 3 else jax.random.normal(ks[i], (NT, B)) * 0.02
    for i in range(6))
alive = (jax.random.uniform(ks[6], (NT, B)) < 0.89).astype(jnp.float32)
n0 = int(jax.device_get(alive.sum()))
print("device:", jax.devices()[0], " n0:", n0, flush=True)
lm = (alive > 0) & (planes[0] < 0)
print("mean leavers/row/face:",
      float(jax.device_get(lm.sum(1).mean())), " max:",
      int(jax.device_get(lm.sum(1).max())), flush=True)


@jax.jit
def full(planes, alive):
    return pex.rebucket_exchange_planes(planes, alive, nt, T, K)


pl2, al2, dropped = full(planes, alive)
print("full exchange dropped:", int(jax.device_get(dropped)), flush=True)
# positions must all be in [0, T) now
bad = 0
for d in range(3):
    lo = jnp.sum(jnp.where((al2 > 0.5) & (pl2[d] < 0), 1.0, 0.0))
    hi = jnp.sum(jnp.where((al2 > 0.5) & (pl2[d] >= T), 1.0, 0.0))
    bad += int(jax.device_get(lo + hi))
print("out-of-tile alive after exchange:", bad, flush=True)


# ablation: no merge skip
@jax.jit
def dim_noskip(planes, alive):
    out_planes, al = planes, alive
    for d in range(3):
        NTl, Bl = al.shape
        coord = out_planes[d]
        a = al > 0.5
        lmm = a & (coord < 0.0)
        lpp = a & (coord >= float(T))
        rm = pex._chunked_cumsum(lmm.astype(jnp.float32)).astype(jnp.int32) - 1
        rp = pex._chunked_cumsum(lpp.astype(jnp.float32)).astype(jnp.int32) - 1
        rank = jnp.where(lmm & (rm < K), rm,
                         jnp.where(lpp & (rp < K), K + rp, -1)
                         ).astype(jnp.int32)
        kill = (lmm & (rm >= K)) | (lpp & (rp >= K))
        rank = jnp.where(kill, 2 * K, rank)
        bufs, al2 = pex.extract(rank, al, out_planes, 2 * K)
        b5 = bufs.reshape(nt + (8, 2 * K))
        minus = jnp.roll(b5[..., :K], -1, 0 + d)
        plus = jnp.roll(b5[..., K:], 1, 0 + d)
        inc = jnp.concatenate([minus, plus], axis=-1).reshape(NTl, 8, 2 * K)
        shift = jnp.concatenate([jnp.full((K,), float(T), jnp.float32),
                                 jnp.full((K,), -float(T), jnp.float32)])
        inc = inc.at[:, d, :].add(jnp.where(inc[:, 6, :] > 0.5, shift, 0.0))
        free = ~(al2 > 0.5)
        fr = pex._chunked_cumsum(free.astype(jnp.float32)).astype(jnp.int32) - 1
        frank = jnp.where(free, fr, -1).astype(jnp.int32)
        out_planes, al = pex.merge(frank, al2, inc, out_planes, active=None)
    return out_planes, al


pl3, al3 = dim_noskip(planes, alive)
d3 = n0 - int(jax.device_get(al3.sum()))
print("no-skip exchange dropped:", d3, flush=True)


# ablation: old cumsum rank build + no skip
@jax.jit
def dim_oldrank(planes, alive):
    out_planes, al = planes, alive
    for d in range(3):
        NTl, Bl = al.shape
        coord = out_planes[d]
        a = al > 0.5
        lmm = a & (coord < 0.0)
        lpp = a & (coord >= float(T))
        rm = jnp.cumsum(lmm.astype(jnp.int32), axis=1) - 1
        rp = jnp.cumsum(lpp.astype(jnp.int32), axis=1) - 1
        rank = jnp.where(lmm & (rm < K), rm,
                         jnp.where(lpp & (rp < K), K + rp, -1)
                         ).astype(jnp.int32)
        kill = (lmm & (rm >= K)) | (lpp & (rp >= K))
        rank = jnp.where(kill, 2 * K, rank)
        bufs, al2 = pex.extract(rank, al, out_planes, 2 * K)
        b5 = bufs.reshape(nt + (8, 2 * K))
        minus = jnp.roll(b5[..., :K], -1, 0 + d)
        plus = jnp.roll(b5[..., K:], 1, 0 + d)
        inc = jnp.concatenate([minus, plus], axis=-1).reshape(NTl, 8, 2 * K)
        shift = jnp.concatenate([jnp.full((K,), float(T), jnp.float32),
                                 jnp.full((K,), -float(T), jnp.float32)])
        inc = inc.at[:, d, :].add(jnp.where(inc[:, 6, :] > 0.5, shift, 0.0))
        free = ~(al2 > 0.5)
        fr = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
        frank = jnp.where(free, fr, -1).astype(jnp.int32)
        out_planes, al = pex.merge(frank, al2, inc, out_planes, active=None)
    return out_planes, al


pl4, al4 = dim_oldrank(planes, alive)
d4 = n0 - int(jax.device_get(al4.sum()))
print("old-rank exchange dropped:", d4, flush=True)
