"""Fused kernels on hardware: correctness + chained timing."""
import sys, time
from functools import partial
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops.tiled import TileSpec

TS = TileSpec(grid=(128, 128, 128), T=8, M=1, B=9216)
NT, B, P, M = TS.NT, TS.B, TS.P, TS.M
SLOTS = NT * B
R = 8

def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))
    return x

def timeit(f, *args, n=3, warmup=1):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    return (time.perf_counter() - t0) / n, out

def report(name, dt, per=R):
    print(f"{name:46s} {dt/per*1e3:8.2f} ms   {dt/per/SLOTS*1e9:6.3f} "
          "ns/slot", flush=True)

k = jax.random.PRNGKey(0)
ks = jax.random.split(k, 5)
xyz = jax.random.uniform(ks[0], (3, NT, B), jnp.float32, -float(M),
                         float(TS.T + M))
vel = 0.05 * jax.random.normal(ks[3], (3, NT, B), jnp.float32)
val = (jax.random.uniform(ks[1], (NT, B)) < 0.9).astype(jnp.float32)
fld = jax.random.normal(ks[2], (NT, P, P, P, 3), jnp.float32)

print(f"device: {jax.devices()[0]}", flush=True)

@jax.jit
def dep_chain(xyz, val):
    v = val; out = None
    for i in range(R):
        t = ptl.deposit(xyz, v, TS, mxu_dtype=jnp.bfloat16)
        v = v + 0.0 * t[:, :1, 0]; out = t
    return out, v
dt, _ = timeit(dep_chain, xyz, val)
report("deposit full-row bf16", dt)

@jax.jit
def depm_chain(xyz, vel, val):
    x = xyz; out = None
    for i in range(R):
        t, x, n = ptl.deposit_move(x, vel, val, -1.0, TS,
                                   mxu_dtype=jnp.bfloat16)
        out = (t, n)
    return out, x
dt, (out, xf) = timeit(depm_chain, xyz, vel, val)
report("deposit_move fused bf16", dt)

@jax.jit
def gat_chain(fld, xyz):
    v = xyz; out = None
    for i in range(R):
        o = ptl.gather(fld, v, TS, mxu_dtype=jnp.bfloat16)
        v = v + 0.0 * o; out = o
    return out, v
dt, _ = timeit(gat_chain, fld, xyz)
report("gather full-row bf16", dt)

@jax.jit
def gk_chain(fld, xyz, vel, val):
    v = vel; out = None
    for i in range(R):
        v, ke = ptl.gather_kick(fld, xyz, v, val, -0.5, TS,
                                mxu_dtype=jnp.bfloat16)
        out = ke
    return out, v
dt, (ke, vf) = timeit(gk_chain, fld, xyz, vel, val)
report("gather_kick fused bf16", dt)

# correctness on hardware vs unfused
t_ref = ptl.deposit(xyz + vel, jnp.where(val > 0, -1.0, 0.0), TS,
                    mxu_dtype=jnp.bfloat16)
t_f, nx, n_out = ptl.deposit_move(xyz, vel, val, -1.0, TS,
                                  mxu_dtype=jnp.bfloat16)
print("deposit_move max err:",
      float(jnp.max(jnp.abs(t_f - t_ref))), " n_out:", float(n_out))
Ep = ptl.gather(fld, xyz, TS, mxu_dtype=jnp.bfloat16)
vref = vel + (-0.5) * Ep * val[None]
vf2, vd = ptl.gather_kick(fld, xyz, vel, val, -0.5, TS,
                          mxu_dtype=jnp.bfloat16)
print("gather_kick max err:", float(jnp.max(jnp.abs(vf2 - vref))))
vd_ref = float(jnp.sum(jnp.sum(vel * vref, axis=0) * val))
print("vdot:", float(vd), "ref:", vd_ref)
