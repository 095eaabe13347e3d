#!/usr/bin/env python3
"""Round-5: find the ~50 ms/step gap between the summed component costs
(pic_step 112 + glue 4.5 + exchange/4 ~36 = ~153 ms) and the measured
headline window (204 ms/step).  Measures production-shaped windows:
  a) scan of R=4 mega steps, NO rebucket        -> pure step cost
  b) scan of R=4 mega steps + electron rebucket -> + rebucket cost
  c) same as (b) but via sim._scan_with_rebuckets (the real nesting)
Run: python experiments/r5_window.py [grid_n]
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation, TiledState, _jit
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
print(f"NT={ts.NT} B={ts.B} M={ts.M} cad={sim.rebucket_every_s} "
      f"cap={sim._exchange_cap}", file=sys.stderr, flush=True)
parts = int(jax.device_get(sim.state.alive.sum()))


def timeit(f, st, reps=3):
    o = f(st)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    t0 = time.monotonic()
    for _ in range(reps):
        o = f(o[0] if isinstance(o, tuple) else o)
        jax.block_until_ready(jax.tree.leaves(o)[0])
    return (time.monotonic() - t0) / reps


R = min(sim.rebucket_every_s)

# (a) R mega steps, no rebucket — uses the production body via a
# stripped scan
import pinc_tpu.tiled_sim as tsm
orig_swr = sim._scan_with_rebuckets


def no_rebucket_swr(body, carry, n):
    carry, out = jax.lax.scan(body, carry, None, length=n)
    return carry, out, jnp.zeros((), jnp.int32)


sim._scan_with_rebuckets = no_rebucket_swr
run_a = sim.make_scan_steps(R, donate=False)
st = sim.state
t = timeit(lambda s: run_a(s)[0], st)
print(f"(a) {R} steps no-rebucket: {t/R*1e3:8.2f} ms/step", flush=True)
sim._scan_with_rebuckets = orig_swr

# (b) production window: R steps + electron rebucket (real scheduling)
run_b = sim.make_scan_steps(R, donate=False)
t = timeit(lambda s: run_b(s)[0], st)
print(f"(b) {R} steps + e-rebucket: {t/R*1e3:8.2f} ms/step", flush=True)

# (c) longer window (4R) to check scan-nesting overheads amortize
run_c = sim.make_scan_steps(4 * R, donate=False)
t = timeit(lambda s: run_c(s)[0], st)
print(f"(c) {4*R} steps production: {t/(4*R)*1e3:8.2f} ms/step", flush=True)

# (d) rebucket alone (both species, jitted standalone)
reb = _jit(lambda s: sim._rebucket(s, species=(0,)))
t = timeit(lambda s: reb(s)[0], st)
print(f"(d) electron rebucket alone: {t*1e3:8.2f} ms", flush=True)

print(f"particles={parts:,}", flush=True)
