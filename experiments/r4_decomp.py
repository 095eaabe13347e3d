#!/usr/bin/env python3
"""Round-4: full step decomposition at the Debye-resolved headline point
(128^3, 32 ppc x 2 species, margin 2, B=17408): isolated pic_step at
M=1/M=2, field glue (fold+fft+efield), and the gather exchange per
species — the budget behind the margin-2 specialization work.
Run: python experiments/r4_decomp.py [grid_n]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation, _jit
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128

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
print(f"NT={ts.NT} B={ts.B} M={ts.M} P={ts.P} cad={sim.rebucket_every_s} "
      f"rows={sim._exchange_rows} cap={sim._exchange_cap}", file=sys.stderr)
slots = st.lpos.shape[0] * ts.NT * ts.B
parts = int(jax.device_get(st.alive.sum()))

from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops import pallas_field as pfield
from pinc_tpu.ops import tiled as tl
from pinc_tpu.solvers.spectral import SpectralSolver

charge = tuple(float(c) for c in np.asarray(sim.params.charge))
qm = tuple(float(c / m) for c, m in zip(charge, np.asarray(sim.params.mass)))

REPS = 20


def timeit(f, *args):
    o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    t0 = time.monotonic()
    o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    return time.monotonic() - t0


def chain_for(ts_k):
    P = ts_k.P
    ep0 = jnp.zeros((ts_k.NT, 3 * P, P * P), jnp.bfloat16)

    @_jit
    def chain(st):
        def body(c, _):
            lpos, vel, ep = c
            tiles, lpos2, vel2, vdot, _ = ptl.pic_step(
                ep, lpos, vel, st.alive, charge, qm, ts_k,
                mxu_dtype=jnp.bfloat16)
            s = jnp.sum(tiles[0, 0, :8]) * 0.0
            return (lpos2, vel2, ep + s.astype(ep.dtype)), vdot[0]
        return jax.lax.scan(body, (st.lpos, st.vel, ep0), None,
                            length=REPS)[1]
    return chain


for M_k in (1, 2):
    ts_k = tl.TileSpec(grid=ts.grid, T=ts.T, M=M_k, B=ts.B, chunk=ts.chunk)
    t = timeit(chain_for(ts_k), st) / REPS
    print(f"pic_step M={M_k} (P={ts_k.P}): {t*1e3:8.2f} ms "
          f"({t/slots*1e9:.3f} ns/slot)", flush=True)

# field glue at M=2 (XLA fold + fft + efield kernel), chained
tiles0 = jnp.zeros((ts.NT, ts.P, ts.P * ts.P), jnp.float32)
solver = SpectralSolver(ts.grid)


@_jit
def chain_glue(tiles0):
    def body(c, _):
        tiles = c
        rho = tl.fold_to_global(tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)
        phi = solver(rho)
        ep = pfield.efield_tiles(phi, ts, out_dtype=jnp.bfloat16)
        return tiles + 0.0 * ep[0, 0, 0].astype(tiles.dtype), rho[0, 0, 0]
    return jax.lax.scan(body, tiles0, None, length=REPS)[1]


t = timeit(chain_glue, tiles0) / REPS
print(f"glue fold+fft+efield M=2: {t*1e3:8.2f} ms "
      f"(fits={pfield.efield_tiles_fits(ts)})", flush=True)
del tiles0

# fold alone
tiles0 = jnp.zeros((ts.NT, ts.P, ts.P * ts.P), jnp.float32)


@_jit
def chain_fold(tiles0):
    def body(c, _):
        rho = tl.fold_to_global(c.reshape((ts.NT,) + (ts.P,) * 3), ts)
        return c + 0.0 * rho[0, 0, 0], rho[0, 0, 0]
    return jax.lax.scan(body, tiles0, None, length=REPS)[1]


t = timeit(chain_fold, tiles0) / REPS
print(f"fold M=2 (XLA): {t*1e3:8.2f} ms", flush=True)
del tiles0

# gather exchange per species (single call, production config)
from pinc_tpu.ops import pallas_exchange as pex

for s in range(st.lpos.shape[0]):
    lp, lv, al = st.lpos[s], st.vel[s], st.alive[s]

    @_jit
    def one_ex(lp, lv, al):
        planes = tuple(lp[d] for d in range(3)) + tuple(
            lv[d] for d in range(3))
        planes, al2, d_n = pex.rebucket_exchange_planes(
            planes, al, ts.ntiles, ts.T, K=sim._exchange_cap,
            rows=sim._exchange_rows, fused=True, impl="auto")
        return planes[0], al2, d_n

    t = timeit(one_ex, lp, lv, al)
    print(f"exchange species {s} (gather rows={sim._exchange_rows}): "
          f"{t*1e3:8.2f} ms", flush=True)

# per-step budget at the production cadences
print(f"particles={parts:,} slots={slots:,}", flush=True)
