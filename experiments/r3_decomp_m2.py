#!/usr/bin/env python3
"""Round-3: step decomposition at the Debye-resolved (margin-2) point.

Measures the isolated pic_step chain at M=2 vs M=1 (same B), the XLA
fold cost at M=2, and the per-species exchange — the data behind the
margin-schedule design (window margins g/d = [1,1,1,2]/[1,1,2,2]).
Run: python experiments/r3_decomp_m2.py [slack]
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation, _jit
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

SLACK = float(sys.argv[1]) if len(sys.argv) > 1 else 1.125

deck = f"""
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
slack = {SLACK}
"""
cfg = PincConfig.from_string(deck)
sim = TiledSimulation(cfg, seed=1)
st = sim.state
ts = sim.ts
print(f"NT={ts.NT} B={ts.B} M={ts.M} P={ts.P} cad={sim.rebucket_every_s} "
      f"rows={sim._exchange_rows} cap={sim._exchange_cap}", file=sys.stderr)
slots = st.lpos.shape[0] * ts.NT * ts.B

from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops import pallas_field as pfield
from pinc_tpu.ops import tiled as tl
from pinc_tpu.solvers.spectral import SpectralSolver

charge = tuple(float(c) for c in np.asarray(sim.params.charge))
qm = tuple(float(c / m) for c, m in zip(charge, np.asarray(sim.params.mass)))

REPS = 20

def timeit(f, *args):
    o = f(*args); jax.block_until_ready(jax.tree.leaves(o)[0])
    t0 = time.monotonic(); o = f(*args)
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

import dataclasses
for M_k in (1, 2):
    ts_k = dataclasses.replace(ts, M=M_k) if hasattr(ts, "M") else ts
    try:
        ts_k = tl.TileSpec(grid=ts.grid, T=ts.T, M=M_k, B=ts.B,
                           chunk=ts.chunk)
        t = timeit(chain_for(ts_k), st) / REPS
        print(f"pic_step M={M_k} (P={ts_k.P}): {t*1e3:8.2f} ms "
              f"({t/slots*1e9:.3f} ns/slot)", flush=True)
    except Exception as e:
        print(f"pic_step M={M_k}: FAILED {e}")

# field glue at M=2, chained (single calls are dominated by the ~25 ms
# tunnel dispatch latency)
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

# exchange measured separately (r3_margin2.py): 134 ms/electron at slack 1.125
