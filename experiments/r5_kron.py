#!/usr/bin/env python3
"""Round-5: A/B the (P^2, B) kron weight build inside pic_step.

The margin-2 pic_step is VPU-bound on the two kron builds (~10 elementwise
passes over (P^2, B) each).  Variants rebuild the SAME values (bit-identical
f32 arithmetic) from separable (P, B) factors:

  iota : current — 4-op hat build per factor on the full (P^2, B)
  bcast: 3D broadcast product (P,1,B)*(1,P,B) -> reshape (P^2, B)
  conc : sublane concat of broadcast rows / tiled copies

Chained scans (REPS inside one jit) — single-call timings through the
tunnel lie.  Run: python experiments/r5_kron.py [N] [variants]
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation, _jit
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
from pinc_tpu.ops import pallas_tiled as ptl

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
VARIANTS = (sys.argv[2] if len(sys.argv) > 2 else "iota,bcast,conc").split(",")

deck = f"""
[time]
nTimeSteps = 40
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = {N},{N},{N}
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 32 pc
nAlloc = 32 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.1,0.0023
drift = 0
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
[tiles]
tileSize = 8
mxuDtype = bf16
slack = 1.0625
"""
cfg = PincConfig.from_string(deck)
sim = TiledSimulation(cfg, seed=1)
st = sim.state
ts = sim.ts
print(f"NT={ts.NT} B={ts.B} M={ts.M} P={ts.P}", file=sys.stderr, flush=True)
slots = st.lpos.shape[0] * ts.NT * ts.B
charge = tuple(float(c) for c in np.asarray(sim.params.charge))
qm = tuple(float(c / m) for c, m in zip(charge, np.asarray(sim.params.mass)))

REPS = 16

_kron_orig = ptl._kron_iota


def _kron_bcast(y_row, z_row, P, M, dtype, order=1):
    wy = ptl._weights_t(y_row, P, M, order)           # (P, B)
    wz = ptl._weights_t(z_row, P, M, order)           # (P, B)
    b = y_row.shape[-1]
    prod = wy[:, None, :] * wz[None, :, :]            # (P, P, B)
    return prod.reshape(P * P, b).astype(dtype)


def _kron_conc(y_row, z_row, P, M, dtype, order=1):
    wy = ptl._weights_t(y_row, P, M, order)
    wz = ptl._weights_t(z_row, P, M, order)
    b = y_row.shape[-1]
    wz_e = jnp.concatenate([wz] * P, axis=0)          # (P*P, B)
    wy_e = jnp.concatenate(
        [jnp.broadcast_to(jax.lax.slice_in_dim(wy, i, i + 1, axis=0),
                          (P, b)) for i in range(P)], axis=0)
    return (wy_e * wz_e).astype(dtype)


def chain(margins=None):
    P = ts.P
    ep0 = jnp.zeros((ts.NT, 3 * P, P * P), jnp.bfloat16)

    @_jit
    def run(lpos, vel, alive):
        def body(c, _):
            lp, vl, ep = c
            tiles, lp2, vl2, vdot, _ = ptl.pic_step(
                ep, lp, vl, alive, charge, qm, ts,
                mxu_dtype=jnp.bfloat16, margins=margins)
            s = jnp.sum(tiles[0, 0, :8]) * 0.0
            return (lp2, vl2, ep + s.astype(ep.dtype)), vdot[0]
        return jax.lax.scan(body, (lpos, vel, ep0), None, length=REPS)[1]
    return run


def timeit(f, *args):
    o = f(*args); jax.block_until_ready(jax.tree.leaves(o)[0])
    t0 = time.monotonic(); o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    return time.monotonic() - t0


impls = {"iota": _kron_orig, "bcast": _kron_bcast, "conc": _kron_conc}
for name in VARIANTS:
    ptl._kron_iota = impls[name]
    for margins in (None, ((1, 1), (1, 1))):
        tag = "(2,2)" if margins is None else "(1,1)"
        try:
            t = timeit(chain(margins), st.lpos, st.vel, st.alive) / REPS
            print(f"pic_step {name} {tag}: {t*1e3:8.2f} ms "
                  f"({t/slots*1e9:.3f} ns/slot)", flush=True)
        except Exception as e:
            print(f"pic_step {name} {tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
ptl._kron_iota = _kron_orig
