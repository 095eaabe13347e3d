#!/usr/bin/env python3
"""Round-5 chained decomposition at the headline point.  Every number
comes from a donated, state-threaded scan (the device tunnel adds
~25-30 ms dispatch per call and XLA hoists loop-invariant work, so only
chained measurements count).

  nr16   : 16 mega steps, NO rebucket          -> pure step cost
  prod16 : 16 steps production (4 e-rebuckets) -> headline steady state
  sched16: same with the per-step margin schedule (fresh=True)
  reb8   : 8 chained electron rebuckets        -> rebucket cost in-jit

Run: python experiments/r5_chain.py [grid_n] [what]
  what: comma list from nr,prod,sched,reb (default all)
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
WHAT = (sys.argv[2] if len(sys.argv) > 2 else "nr,prod,sched,reb").split(",")

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
      f"cap={sim._exchange_cap} rows={sim._exchange_rows}",
      file=sys.stderr, flush=True)
st = sim.state
sim.state = None
R = min(sim.rebucket_every_s)
n = 4 * R


def run_windows(label, mk, st, per=None, reps=2):
    """Compile mk() -> run_n, run 1 warmup + reps windows chaining the
    donated state; prints ms/step."""
    t0 = time.monotonic()
    run_n = mk()
    st2, _ = run_n(st)
    jax.block_until_ready(st2.lpos if hasattr(st2, "lpos") else st2[0].lpos)
    print(f"{label}: compile+first {time.monotonic()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.monotonic()
    for _ in range(reps):
        st2, _ = run_n(st2)
    jax.block_until_ready(st2.lpos if hasattr(st2, "lpos") else st2[0].lpos)
    dt = (time.monotonic() - t0) / reps / (per or n)
    print(f"{label}: {dt*1e3:8.2f} ms/{'step' if per is None else 'unit'}",
        flush=True)
    return st2


if "nr" in WHAT:
    orig = sim._scan_with_rebuckets
    sim._scan_with_rebuckets = (
        lambda body, carry, k: jax.lax.scan(body, carry, None, length=k)
        + (jnp.zeros((), jnp.int32),))
    st = run_windows("nr16  ", lambda: sim.make_scan_steps(n, donate=True),
                     st)
    sim._scan_with_rebuckets = orig

if "prod" in WHAT:
    st = run_windows("prod16", lambda: sim.make_scan_steps(n, donate=True),
                     st)

if "sched" in WHAT:
    st = run_windows("sched16", lambda: sim.make_scan_steps(
        n, donate=True, fresh=True), st)

if "reb" in WHAT:
    def mk_reb():
        def f(st):
            def body(c, _):
                c, d = sim._rebucket(c, species=(0,))
                return c, d
            return jax.lax.scan(body, st, None, length=8)
        return _jit(f, donate_argnums=(0,))
    st = run_windows("reb8  ", mk_reb, st, per=8)

print("done", flush=True)
