"""Prototype: build the (P^2, B) hat-weight kron via two small MXU
matmuls (selection matrices against the per-axis hat weights) instead of
~1000 elementwise VPU ops per slot.  Chained timing vs current kernels."""
import sys, time
from functools import partial
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops.tiled import TileSpec

TS = TileSpec(grid=(128, 128, 128), T=8, M=1, B=9216)
NT, B, P, M = TS.NT, TS.B, TS.P, TS.M
SLOTS = NT * B
R = 8
G = 8


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))
    return x


def timeit(f, *args, n=3, warmup=1):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    return (time.perf_counter() - t0) / n, out


def report(name, dt, per=R):
    print(f"{name:44s} {dt/per*1e3:8.2f} ms   {dt/per/SLOTS*1e9:6.3f} "
          "ns/slot", flush=True)


# selection matrices: Ay[j, j//P] = 1, Az[j, j%P] = 1
Ay = np.zeros((P * P, P), np.float32)
Az = np.zeros((P * P, P), np.float32)
for j in range(P * P):
    Ay[j, j // P] = 1.0
    Az[j, j % P] = 1.0
Ay = jnp.asarray(Ay)
Az = jnp.asarray(Az)


def _kron_mxu(y_row, z_row, ay_ref, az_ref, mxu_dtype):
    wy = ptl._weights_t(y_row, P, M)                  # (P, B) f32
    wz = ptl._weights_t(z_row, P, M)
    ky = jax.lax.dot_general(ay_ref[...], wy, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    kz = jax.lax.dot_general(az_ref[...], wz, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return (ky * kz).astype(mxu_dtype)


def _deposit_kernel_v4(ay_ref, az_ref, x_ref, y_ref, z_ref, val_ref,
                       out_ref, *, mxu_dtype):
    def tile_body(g, _):
        sl = (pl.ds(g, 1), slice(None))
        wx = (ptl._weights_t(x_ref[sl], P, M) * val_ref[sl]).astype(mxu_dtype)
        wyz = _kron_mxu(y_ref[sl], z_ref[sl], ay_ref, az_ref, mxu_dtype)
        acc = jax.lax.dot_general(
            wx, wyz, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[pl.ds(g, 1), :, :] = acc[None]
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def deposit_v4(xyz, value, mxu_dtype=jnp.bfloat16):
    row = pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    amat = pl.BlockSpec((P * P, P), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_deposit_kernel_v4, mxu_dtype=mxu_dtype),
        out_shape=jax.ShapeDtypeStruct((NT, P, P * P), jnp.float32),
        grid=(NT // G,),
        in_specs=[amat, amat, row, row, row, row],
        out_specs=pl.BlockSpec((G, P, P * P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(Ay.astype(mxu_dtype) if mxu_dtype != jnp.float32 else Ay,
      Az.astype(mxu_dtype) if mxu_dtype != jnp.float32 else Az,
      xyz[0], xyz[1], xyz[2], value)


def _gather_kernel_v4(ay_ref, az_ref, x_ref, y_ref, z_ref, e_ref, out_ref,
                      *, C, mxu_dtype):
    def tile_body(g, _):
        E_all = e_ref[g, :, :, :].reshape(C * P, P * P).astype(mxu_dtype)
        sl = (pl.ds(g, 1), slice(None))
        wx = ptl._weights_t(x_ref[sl], P, M)
        wyz = _kron_mxu(y_ref[sl], z_ref[sl], ay_ref, az_ref, mxu_dtype)
        G_all = jax.lax.dot_general(
            E_all, wyz, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for c in range(C):
            Gc = G_all[c * P:(c + 1) * P, :]
            out_ref[c, g, :] = jnp.sum(wx * Gc, axis=0)
        return 0
    jax.lax.fori_loop(0, G, tile_body, 0)


def gather_v4(field_pad, xyz, mxu_dtype=jnp.bfloat16):
    C = field_pad.shape[-1]
    E = jnp.moveaxis(field_pad, -1, 1).reshape(NT, C, P, P * P)
    row = pl.BlockSpec((G, B), lambda i: (i, 0), memory_space=pltpu.VMEM)
    amat = pl.BlockSpec((P * P, P), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_gather_kernel_v4, C=C, mxu_dtype=mxu_dtype),
        out_shape=jax.ShapeDtypeStruct((C, NT, B), jnp.float32),
        grid=(NT // G,),
        in_specs=[amat, amat, row, row, row,
                  pl.BlockSpec((G, C, P, P * P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, G, B), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )(Ay.astype(mxu_dtype) if mxu_dtype != jnp.float32 else Ay,
      Az.astype(mxu_dtype) if mxu_dtype != jnp.float32 else Az,
      xyz[0], xyz[1], xyz[2], E)


if __name__ == "__main__":
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    xyz = jax.random.uniform(ks[0], (3, NT, B), jnp.float32, -float(M),
                             float(TS.T + M))
    val = (jax.random.uniform(ks[1], (NT, B)) < 0.9).astype(jnp.float32)
    fld = jax.random.normal(ks[2], (NT, P, P, P, 3), jnp.float32)
    print("device:", jax.devices()[0], flush=True)

    # correctness vs v3
    t_ref = ptl.deposit(xyz, val, TS, mxu_dtype=jnp.bfloat16)
    t_v4 = deposit_v4(xyz, val)
    print("deposit_v4 vs v3 max err:",
          float(jnp.max(jnp.abs(t_v4 - t_ref))), flush=True)
    g_ref = ptl.gather(fld, xyz, TS, mxu_dtype=jnp.bfloat16)
    g_v4 = gather_v4(fld, xyz)
    print("gather_v4 vs v3 max err:",
          float(jnp.max(jnp.abs(g_v4 - g_ref))), flush=True)

    @jax.jit
    def dep_chain_v4(xyz, val):
        v = val; out = None
        for i in range(R):
            t = deposit_v4(xyz, v)
            v = v + 0.0 * t[:, :1, 0]; out = t
        return out, v
    dt, _ = timeit(dep_chain_v4, xyz, val)
    report("deposit v4 (MXU kron) bf16", dt)

    @jax.jit
    def dep_chain_v3(xyz, val):
        v = val; out = None
        for i in range(R):
            t = ptl.deposit(xyz, v, TS, mxu_dtype=jnp.bfloat16)
            v = v + 0.0 * t[:, :1, 0]; out = t
        return out, v
    dt, _ = timeit(dep_chain_v3, xyz, val)
    report("deposit v3 (VPU kron) bf16", dt)

    @jax.jit
    def gat_chain_v4(fld, xyz):
        v = xyz; out = None
        for i in range(R):
            o = gather_v4(fld, v)
            v = v + 0.0 * o; out = o
        return out, v
    dt, _ = timeit(gat_chain_v4, fld, xyz)
    report("gather v4 (MXU kron) bf16", dt)

    @jax.jit
    def gat_chain_v3(fld, xyz):
        v = xyz; out = None
        for i in range(R):
            o = ptl.gather(fld, v, TS, mxu_dtype=jnp.bfloat16)
            v = v + 0.0 * o; out = o
        return out, v
    dt, _ = timeit(gat_chain_v3, fld, xyz)
    report("gather v3 (VPU kron) bf16", dt)
