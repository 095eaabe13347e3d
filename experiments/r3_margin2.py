"""Round-3 experiment: margin-2 (Debye-resolved) deck layout search.

Hypothesis: the margin-2 slowdown is the P^2 = 169 > 128 kron spanning two
MXU lane tiles (two streaming passes per particle slot).  tileSize=4 at
M=2 gives P=9, P^2=81 <= 128 -> single pass.  Times the scan window and
the isolated exchange for each candidate layout.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DECK = """
[time]
nTimeSteps = {steps}
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
tileSize = {tile}
mxuDtype = bf16
slack = {slack}
{extra}
"""


def run(tile, steps=40, slack=1.0625, extra=""):
    from pinc_tpu.config import PincConfig
    from pinc_tpu.tiled_sim import TiledSimulation
    cfg = PincConfig.from_string(
        DECK.format(steps=steps, tile=tile, slack=slack, extra=extra))
    t0 = time.monotonic()
    sim = TiledSimulation(cfg, seed=1)
    n_particles = int(jax.device_get(sim.state.alive.sum()))
    carry = sim.state
    sim.state = None
    log(f"--- tile={tile} extra={extra!r}: NT={sim.ts.NT} B={sim.ts.B} "
        f"M={sim.ts.M} P={sim.ts.P} cad={sim.rebucket_every_s} "
        f"cap={sim._exchange_cap} rows={sim._exchange_rows} "
        f"setup {time.monotonic()-t0:.1f}s")
    run_n = sim.make_scan_steps(steps, donate=True)
    t0 = time.monotonic()
    carry, _ = run_n(carry)
    jax.block_until_ready(carry.lpos)
    log(f"compile+first: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    carry, (ke, pe, dropped) = run_n(carry)
    jax.block_until_ready(carry.lpos)
    wall = time.monotonic() - t0
    psteps = n_particles * steps / wall
    log(f"{steps} steps in {wall:.3f}s -> {psteps:.3e} p-steps/s "
        f"(KE[-1]={float(np.asarray(ke)[-1].sum()):.4g} "
        f"dropped={int(dropped)})")
    # isolated electron exchange cost
    st = carry
    reb = sim._rebucket_jit
    st, d = reb(st, species=(0,))
    jax.block_until_ready(st.lpos)
    t0 = time.monotonic()
    for _ in range(3):
        st, d = reb(st, species=(0,))
    jax.block_until_ready(st.lpos)
    log(f"electron exchange: {(time.monotonic()-t0)/3*1e3:.1f} ms "
        f"(amortized {(time.monotonic()-t0)/3*1e3/sim.rebucket_every_s[0]:.1f}"
        f" ms/step at cadence {sim.rebucket_every_s[0]})")
    return psteps


if __name__ == "__main__":
    which = sys.argv[1:] or ["8", "4"]
    for w in which:
        if "=" in w:
            tile, extra = w.split(";", 1) if ";" in w else (w, "")
        run(int(w))
