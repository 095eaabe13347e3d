#!/usr/bin/env python3
"""Round-5: split the production rebucket overhead (296 ms implied) into
(a) nested-scan stitching vs (b) leaver-proportional exchange work.

  prod16n: production nested scan (reference, = r5_chain prod16)
  prod16f: FLAT segment structure (scan(4)+reb unrolled x4, no nesting)
  sched16f: flat + margin schedule
Prints dropped counts to confirm physics.
Run: python experiments/r5_reb_split.py [grid_n]
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
ts = sim.ts
print(f"NT={ts.NT} B={ts.B} M={ts.M} cad={sim.rebucket_every_s}",
      file=sys.stderr, flush=True)
st = sim.state
sim.state = None
n = 16


def run_windows(label, mk, st, reps=2):
    t0 = time.monotonic()
    run_n = mk()
    st2, out = run_n(st)
    jax.block_until_ready(st2.lpos)
    print(f"{label}: compile+first {time.monotonic()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.monotonic()
    for _ in range(reps):
        st2, out = run_n(st2)
    jax.block_until_ready(st2.lpos)
    dt = (time.monotonic() - t0) / reps / n
    print(f"{label}: {dt*1e3:8.2f} ms/step dropped={int(out[2])}",
          flush=True)
    return st2


# flat segment structure: force the non-nested path by lying about the
# slow cadence alignment (events dict path)
def flat_swr(self, body, carry, k):
    tree = jax.tree_util
    outs = []
    dropped = jnp.zeros((), jnp.int32)
    prev = 0
    for seg in range(k // 4):
        carry, out = jax.lax.scan(body, carry, None, length=4)
        outs.append(out)
        st2, d = self._rebucket(carry[0], species=(0,))
        carry = (st2,) + tuple(carry[1:])
        dropped = dropped + d
    out = tree.tree_map(lambda *xs: jnp.concatenate(xs), *outs)
    return carry, out, dropped


st = run_windows("prod16n ",
                 lambda: sim.make_scan_steps(n, donate=True), st)

orig = sim._scan_with_rebuckets
sim._scan_with_rebuckets = flat_swr.__get__(sim)
st = run_windows("prod16f ",
                 lambda: sim.make_scan_steps(n, donate=True), st)
sim._scan_with_rebuckets = orig

# flat + margin schedule: patch _scan_sched's generic path
def flat_sched(self, body_m, carry, k):
    tree = jax.tree_util
    plans = self._mid_margins(0, slow_full=False)
    outs = []
    dropped = jnp.zeros((), jnp.int32)
    for seg in range(k // 4):
        for margins in plans:
            carry, out = body_m(carry, margins)
            outs.append(tree.tree_map(lambda a: a[None], out))
        st2, d = self._rebucket(carry[0], species=(0,))
        carry = (st2,) + tuple(carry[1:])
        dropped = dropped + d
    out = tree.tree_map(lambda *xs: jnp.concatenate(xs), *outs)
    return carry, out, dropped


sim._scan_sched = flat_sched.__get__(sim)
st = run_windows("sched16f",
                 lambda: sim.make_scan_steps(n, donate=True, fresh=True),
                 st)
print("done", flush=True)
