#!/usr/bin/env python3
"""Probe 3: primitives for the gather-based exchange (v6).

1. (8,128) take_along_axis with int32 VALUES (index composition).
2. pltpu.roll with a TRACED shift (dynamic rotate).
3. A realistic extract-shaped kernel: per (8, 2176) row-block, 6 classes
   x 17 chunks x (binsearch + 8 payload gathers) — compile + runtime at
   NT=4096 (production tile count).
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, flush=True)


def probe(name, fn):
    try:
        out = jax.block_until_ready(fn())
        log(f"PASS {name}: {np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:
        log(f"FAIL {name}: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
        return False


# ---- 1. int32 gather
def int_gather():
    src = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    idx = jnp.flip(jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32),
                                    (8, 128)), axis=1)

    def kern(p, i, o):
        o[:] = jnp.take_along_axis(p[:], i[:], axis=1)

    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return jax.jit(lambda: f(src, idx))()


probe("int32 (8,128) gather", int_gather)


# ---- 2. dynamic roll
def dyn_roll():
    src = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)

    def kern(p, s_ref, o):
        o[:] = pltpu.roll(p[:], s_ref[0], axis=1)

    f = pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    return jax.jit(lambda: f(src, jnp.array([5], jnp.int32)))()


probe("pltpu.roll dynamic shift (8,256)", dyn_roll)


# ---- 3. realistic extract-shaped kernel
L, NC, KS = 2176, 17, 128
N_CLS, NPAY = 6, 8
NT = 4096


def _binsearch(cum, tgt):
    """first idx with cum[idx] >= tgt over 128 lanes (lower bound)."""
    pos = jnp.zeros_like(tgt)
    for s in (64, 32, 16, 8, 4, 2, 1):
        np_ = pos + s
        v = jnp.take_along_axis(cum, jnp.minimum(np_ - 1, 127), axis=1)
        pos = jnp.where(v < tgt, np_, pos)
    return pos


def extract_kernel(alive_ref, *refs, T=8):
    plane_refs = refs[:6]
    buf_ref, alive_out_ref = refs[6], refs[7]
    alive = alive_ref[0]
    al = alive > 0.5
    x, y, z = (plane_refs[i][0] for i in range(3))
    Tf = float(T)
    xm = al & (x < 0.0)
    xp = al & (x >= Tf)
    xa = xm | xp
    ym = al & (~xa) & (y < 0.0)
    yp = al & (~xa) & (y >= Tf)
    ya = ym | yp
    zm = al & (~xa) & (~ya) & (z < 0.0)
    zp = al & (~xa) & (~ya) & (z >= Tf)
    masks = (xm, xp, ym, yp, zm, zp)
    leave = xa | ya | zp | zm
    alive_out_ref[0] = jnp.where(leave, 0.0, alive)

    iota128 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    tgt = (iota128 + 1).astype(jnp.float32)
    payload = [plane_refs[p][0] for p in range(6)] + [
        jnp.ones_like(alive), jnp.zeros_like(alive)]
    for cls in range(N_CLS):
        m = masks[cls].astype(jnp.float32)
        # full-row inclusive scan via 128-wide triangular matmuls
        i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        u = (i <= j).astype(jnp.float32)
        run = jnp.zeros((8, 1), jnp.float32)
        out_p = [jnp.zeros((8, KS), jnp.float32) for _ in range(NPAY)]
        for c in range(NC):
            mc = m[:, c * 128:(c + 1) * 128]
            cumc = jax.lax.dot_general(
                mc, u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            base = run                       # (8,1) exclusive chunk base
            run = run + cumc[:, 127:128]
            n_c = cumc[:, 127:128]

            src = _binsearch(cumc, tgt)      # rank k -> local lane
            # destination lanes [base, base+n_c) in the class buffer
            kk = iota128.astype(jnp.float32)
            rel = kk - base                  # local rank for buffer lane k
            hit = (rel >= 0.0) & (rel < n_c) & (kk < float(KS))
            idx2 = jnp.take_along_axis(
                src, jnp.clip(rel.astype(jnp.int32), 0, 127), axis=1)
            for p in range(NPAY):
                pc = payload[p][:, c * 128:(c + 1) * 128]
                v = jnp.take_along_axis(pc, idx2, axis=1)
                out_p[p] = jnp.where(hit, v, out_p[p])
        for p in range(NPAY):
            buf_ref[0, p, :, cls * KS:(cls + 1) * KS] = out_p[p]


def run_extract():
    rng = np.random.default_rng(0)
    alive = (rng.uniform(size=(NT, 8, L)) < 0.9).astype(np.float32)
    planes = [rng.uniform(-1.5, 9.5, (NT, 8, L)).astype(np.float32)
              for _ in range(3)]
    planes += [rng.normal(size=(NT, 8, L)).astype(np.float32)
               for _ in range(3)]
    row = pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        extract_kernel,
        out_shape=(jax.ShapeDtypeStruct((NT, NPAY, 8, N_CLS * KS),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((NT, 8, L), jnp.float32)),
        grid=(NT,),
        in_specs=[row] * 7,
        out_specs=(pl.BlockSpec((1, NPAY, 8, N_CLS * KS),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM), row),
    )
    al = jnp.asarray(alive)
    pls = [jnp.asarray(p) for p in planes]

    @jax.jit
    def chain(al, pls):
        def body(c, _):
            al = c
            bufs, al2 = f(al, *pls)
            return al2 + 0.0 * bufs[0, 0, 0, 0], bufs[0, 6, 0, 0]
        return jax.lax.scan(body, al, None, length=5)

    t0 = time.monotonic()
    out = jax.block_until_ready(chain(al, pls))
    log(f"extract-shaped kernel compile+run: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    out = jax.block_until_ready(chain(al, pls))
    dt = (time.monotonic() - t0) / 5
    log(f"extract-shaped kernel: {dt*1e3:.2f} ms/pass at NT={NT} "
        f"(planes {NT*8*L*7*4/1e9:.2f} GB read)")
    # correctness spot check on tile 0 vs numpy
    bufs, al2 = jax.jit(lambda al, pls: f(al, *pls))(al, pls)
    b0 = np.asarray(bufs[0])          # (NPAY, 8, 6*KS)
    a0, x0 = alive[0] > 0.5, planes[0][0]
    xm0 = a0 & (x0 < 0)
    want_rows = []
    for r in range(8):
        lanes = np.nonzero(xm0[r])[0][:KS]
        want_rows.append(planes[3][0][r, lanes])
    ok = all(np.array_equal(b0[3, r, :len(w)], w)
             for r, w in enumerate(want_rows))
    flag_ok = all(np.array_equal(
        b0[6, r, :len(want_rows[r])],
        np.ones(len(want_rows[r]), np.float32)) for r in range(8))
    log(f"class-0 payload bit-exact: {ok}, flags: {flag_ok}")


if __name__ == "__main__":
    run_extract()
