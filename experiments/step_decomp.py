#!/usr/bin/env python3
"""Step decomposition at the official bench point: isolated pic_step
chain vs full mega body vs glue, plus per-species re-bucket cost.
Run: python experiments/step_decomp.py"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation

deck = """
[time]
nTimeSteps = 40
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = 128,128,128
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 32 pc
nAlloc = 32 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.02,0.0005
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
print(f"NT={ts.NT} B={ts.B} S={st.lpos.shape[0]}", file=sys.stderr)
slots = st.lpos.shape[0] * ts.NT * ts.B

from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops import pallas_field as pfield
from pinc_tpu.solvers.spectral import SpectralSolver

charge = tuple(float(c) for c in np.asarray(sim.params.charge))
qm = tuple(float(c / m) for c, m in zip(charge, np.asarray(sim.params.mass)))
solver_t = SpectralSolver(ts.grid)

rho0, phi0, E0 = jax.jit(sim._fields)(st)
ep5 = pfield.efield_tiles(phi0, ts, out_dtype=jnp.bfloat16)
jax.block_until_ready(ep5)

REPS = 20

def timeit(f, *args):
    o = f(*args); jax.block_until_ready(jax.tree.leaves(o)[0])
    t0 = time.monotonic(); o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    return time.monotonic() - t0

# 1. isolated pic_step chain (donated, outputs feed inputs)
@jax.jit
def chain_kernel(st, ep5):
    def body(c, _):
        lpos, vel, ep = c
        tiles, lpos2, vel2, vdot, _ = ptl.pic_step(
            ep, lpos, vel, st.alive, charge, qm, ts,
            mxu_dtype=jnp.bfloat16)
        s = jnp.sum(tiles[0, 0, :8]) * 0.0
        return (lpos2, vel2, ep + s.astype(ep.dtype)), vdot[0]
    return jax.lax.scan(body, (st.lpos, st.vel, ep5), None, length=REPS)[1]

t = timeit(chain_kernel, st, ep5) / REPS
print(f"pic_step isolated : {t*1e3:8.2f} ms  ({t/slots*1e9:.3f} ns/slot)")

# 2. full mega body chain
@jax.jit
def chain_full(st, ep5):
    def body(c, _):
        lpos, vel, ep = c
        tiles, lpos2, vel2, vdot, _ = ptl.pic_step(
            ep, lpos, vel, st.alive, charge, qm, ts,
            mxu_dtype=jnp.bfloat16)
        rho = pfield.fold_global_t(tiles, ts)
        phi = solver_t(rho)
        from pinc_tpu.grid import potential_energy
        pe = potential_energy(rho, phi)
        ep2 = pfield.efield_tiles(phi, ts, out_dtype=jnp.bfloat16,
                                  transposed=True)
        return (lpos2, vel2, ep2), pe
    return jax.lax.scan(body, (st.lpos, st.vel, ep5), None, length=REPS)[1]

t2 = timeit(chain_full, st, ep5) / REPS
print(f"full mega body    : {t2*1e3:8.2f} ms  (glue+carry = {(t2-t)*1e3:.2f})")

# 3. re-bucket cost per species
for s in range(2):
    f = jax.jit(lambda st, s=s: sim._rebucket(st, species=(s,)))
    tr = timeit(f, st)
    print(f"rebucket species {s}: {tr*1e3:8.2f} ms "
          f"(cadence {sim.rebucket_every_s[s]} -> "
          f"{tr*1e3/sim.rebucket_every_s[s]:.2f} ms/step amortized)")
