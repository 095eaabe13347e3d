#!/usr/bin/env python3
"""Round-4 A/B: gather (v6) vs one-hot (v5) exchange at the production
point (128^3, 32 ppc/species, B=17408-class buckets).

Chained in-jit scan so the device-tunnel dispatch latency cancels.
Also checks bitwise payload equivalence between the two paths after a
realistic drift (velocity multiset must survive, positions match up to
the frame shifts both paths apply identically).

Run: python experiments/r4_exchange_ab.py [vth] [reps]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation, _jit
from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

VTH = sys.argv[1] if len(sys.argv) > 1 else "0.1,0.0023"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


cfg = PincConfig.from_string(f"""
[time]
nTimeSteps = 10
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
thermalVelocity = {VTH}
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
""")
sim = TiledSimulation(cfg, seed=1)
st = sim.state
ts = sim.ts
K = sim._exchange_cap
log(f"NT={ts.NT} B={ts.B} T={ts.T} M={ts.M} cap={K} "
    f"rows={sim._exchange_rows}")

# electron species (index 0), drifted a few steps so there are leavers
planes0 = tuple(st.lpos[0, d] for d in range(3))
vel0 = tuple(st.vel[0, d] for d in range(3))
al = st.alive[0].astype(jnp.float32)
drift = 2.0  # tile-local drift in cells, stays in the +-1-tile envelope
planes = tuple(jnp.asarray(p + drift * v / float(jnp.max(jnp.abs(v))))
               for p, v in zip(planes0, vel0)) + vel0


def chained(impl, fused):
    def chain(p, a):
        def body(c, _):
            p, a = c
            p2, a2, d = pex.rebucket_exchange_planes(
                p, a, ts.ntiles, ts.T, K=K, rows=True, fused=fused,
                impl=impl)
            return (p2, a2), d
        return jax.lax.scan(body, (p, a), None, length=REPS)[1]
    f = _jit(chain)
    t0 = time.monotonic()
    d = f(planes, al); jax.block_until_ready(d)
    tc = time.monotonic() - t0
    t0 = time.monotonic()
    d = f(planes, al); jax.block_until_ready(d)
    t = (time.monotonic() - t0) / REPS
    return t, int(np.asarray(d).sum()), tc


variants = [("gather", True), ("onehot", True)]
if "--all" in sys.argv:
    variants += [("gather", False), ("onehot", False)]
for impl, fused in variants:
    t, dr, tc = chained(impl, fused)
    log(f"{impl:7s} fused={int(fused)}: {t*1e3:8.2f} ms/exchange  "
        f"dropped={dr}  (compile {tc:.1f}s)")

# single-shot equivalence: alive counts + velocity multisets must agree
o1 = _jit(lambda p, a: pex.rebucket_exchange_planes(
    p, a, ts.ntiles, ts.T, K=K, rows=True, fused=True, impl="onehot"))(
        planes, al)
o2 = _jit(lambda p, a: pex.rebucket_exchange_planes(
    p, a, ts.ntiles, ts.T, K=K, rows=True, fused=True, impl="gather"))(
        planes, al)
a1, a2 = (np.asarray(o[1]) > 0.5 for o in (o1, o2))
log(f"alive: onehot={a1.sum()} gather={a2.sum()} "
    f"dropped: {int(o1[2])}/{int(o2[2])}")
for p in range(3, 6):
    v1 = np.sort(np.asarray(o1[0][p])[a1].view(np.uint32))
    v2 = np.sort(np.asarray(o2[0][p])[a2].view(np.uint32))
    same = v1.shape == v2.shape and bool(np.all(v1 == v2))
    log(f"vel[{p-3}] multiset bitwise equal: {same}")
