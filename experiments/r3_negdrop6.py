"""v3 per-tile stage audit: extract_fused books, roll books, merge_fused
books, per dim, on the post-4-step state."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.tiled_sim import TiledSimulation

N = int(os.environ.get("N", "64"))
DECK = f"""
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
marginschedule = false
"""

cfg = PincConfig.from_string(DECK)
sim = TiledSimulation(cfg, seed=1)
st = sim.state
sim.rebucket_every_s = [1000, 1000]
sim.rebucket_every = 1000
run4 = sim.make_scan_steps(4)
st, _ = run4(st)

nt, T = sim.ts.ntiles, sim.ts.T
K = sim._exchange_cap


def count(a):
    return int((np.asarray(a) > 0.5).astype(np.int64).sum())


lpos_s, vel_s, alive = st.lpos[0], st.vel[0], st.alive[0]
planes = tuple(lpos_s[d] for d in range(3)) + tuple(
    vel_s[d] for d in range(3))
NT, B = alive.shape
n = count(alive)
print(f"start: {n}  K={K} B={B}")

for d in range(3):
    coord = planes[d]
    bufs, alive2 = jax.jit(lambda c, a, p: pex.extract_fused(
        c, a, p, K, T))(coord, alive, planes)
    n2 = count(alive2)
    bn = np.asarray(bufs)
    nbuf = count(bn[:, 6, :])
    # duplicate flags? flag values not in {0,1}?
    flg = bn[:, 6, :]
    wrong = int(((flg > 0.5) & (np.abs(flg - 1.0) > 1e-3)).sum())
    print(f"dim {d} extract: killed={n - n2} buffered={nbuf} "
          f"flag!=1 count={wrong} books={'OK' if n - n2 == nbuf else 'BAD'}")
    # host-side exact leaver count for comparison
    c_np = np.asarray(coord)
    a_np = np.asarray(alive) > 0.5
    lm = a_np & (c_np < 0)
    lp = a_np & (c_np >= T)
    print(f"  host: leavers minus={int(lm.sum())} plus={int(lp.sum())} "
          f"(cap K={K}; per-tile max minus="
          f"{int(lm.sum(axis=1).max())} plus={int(lp.sum(axis=1).max())})")

    b5 = bufs.reshape(tuple(nt) + (8, 2 * K))
    minus = jnp.roll(b5[..., :K], -1, d)
    plus = jnp.roll(b5[..., K:], 1, d)
    inc = jnp.concatenate([minus, plus], axis=-1).reshape(NT, 8, 2 * K)
    shift = jnp.concatenate([jnp.full((K,), float(T), jnp.float32),
                             jnp.full((K,), -float(T), jnp.float32)])
    inc = inc.at[:, d, :].add(jnp.where(inc[:, 6, :] > 0.5, shift, 0.0))
    ninc = count(np.asarray(inc)[:, 6, :])
    planes2, alive3 = jax.jit(lambda a, i, p: pex.merge_fused(
        a, i, p, K))(alive2, inc, planes)
    n3 = count(alive3)
    print(f"dim {d} merge: arrivals={ninc} placed={n3 - n2} "
          f"{'DUP!' if n3 - n2 > ninc else 'ok'} total={n3}")
    planes, alive, n = planes2, alive3, n3
