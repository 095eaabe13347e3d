#!/usr/bin/env python3
"""Round-5: CHAINED decomposition of the gather-exchange rebucket at the
headline point.  Each phase is measured as a donated state-threaded scan
(unchained timings through the tunnel lie):

  reb    : full production _rebucket (one species) x8
  ex     : extract_compact_rows_g only x8 (alive threads through)
  excl   : extract + 3-axis cleanup x8
  mg     : merge_rows_g only x8 (planes+alive thread through, inc const)
  full   : rebucket_exchange_all_rows_g x8 (kernels + XLA glue)

Run: python experiments/r5_rebchain.py [grid_n] [what]
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
WHAT = (sys.argv[2] if len(sys.argv) > 2 else "reb,ex,excl,mg,full").split(",")

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
sim.state = None
ts = sim.ts
from pinc_tpu.ops import pallas_exchange as pex
from pinc_tpu.ops import pallas_gather_exchange as pgx

K = sim._exchange_cap
Ks = pgx.round_cap(pex.default_row_cap(K, ts.B))
KU = pgx.total_cap(Ks, K)
Ke = pgx.round_cap(max(128, Ks // 4))
print(f"NT={ts.NT} B={ts.B} M={ts.M} cap={K} Ks={Ks} KU={KU}",
      file=sys.stderr, flush=True)

s = 0
lp = st.lpos[s]
lv = st.vel[s]
al = st.alive[s]
planes0 = tuple(lp[d] for d in range(3)) + tuple(lv[d] for d in range(3))
REPS = 8


def timeit(label, mk, *args, rethread=None):
    """mk() -> f; f(*args) -> out.  rethread(out, args) -> new args for
    the timed call — the device tunnel MEMOIZES (executable, args) pairs,
    so the timed call must receive different buffers than the warmup."""
    t0 = time.monotonic()
    f = mk()
    o = f(*args)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    print(f"{label}: compile+first {time.monotonic()-t0:.1f}s",
          file=sys.stderr, flush=True)
    args2 = rethread(o, args) if rethread else args
    t0 = time.monotonic()
    o = f(*args2)
    args3 = rethread(o, args2) if rethread else args2
    o = f(*args3)
    jax.block_until_ready(jax.tree.leaves(o)[0])
    dt = (time.monotonic() - t0) / (2 * REPS)
    print(f"{label}: {dt*1e3:8.2f} ms/iter", flush=True)


if "reb" in WHAT:
    def mk():
        def f(stt):
            def body(c, _):
                c, d = sim._rebucket(c, species=(0,))
                return c, d
            return jax.lax.scan(body, stt, None, length=REPS)
        return _jit(f, donate_argnums=(0,))
    timeit("reb   ", mk, st, rethread=lambda o, a: (o[0],))

if "ex" in WHAT:
    def mk():
        def f(planes, alive):
            def body(c, _):
                al = c
                bufs, al2 = pgx.extract_compact_rows_g(al, planes, KU, ts.T)
                # thread alive through; keep bufs live via a cheap reduce
                return al2 + 0.0 * bufs[0, 0, 0, 0], bufs[0, 6, 0, 0]
            return jax.lax.scan(body, alive, None, length=REPS)
        return _jit(f)
    timeit("ex    ", mk, planes0, al,
           rethread=lambda o, a: (a[0], o[0]))

if "excl" in WHAT:
    def mk():
        def f(planes, alive):
            def body(c, _):
                al = c
                bufs, al2 = pgx.extract_compact_rows_g(al, planes, KU, ts.T)
                settled, face6 = pgx.cleanup_rows_g(bufs, Ks, ts.T,
                                                    axes=(0, 1, 2))
                keep = sum(f[0, 6, 0, 0] for f in face6) + settled[0, 6, 0, 0]
                return al2 + 0.0 * keep, keep
            return jax.lax.scan(body, alive, None, length=REPS)
        return _jit(f)
    timeit("excl  ", mk, planes0, al,
           rethread=lambda o, a: (a[0], o[0]))

if "mg" in WHAT:
    Wx = 2 * Ks
    Wy1 = Ks + Ke
    widths = (Wx, 2 * Wy1, Ks, Ke, Ke, Ks, Ke, Ke)
    blocks = []
    off = 0
    for w in widths:
        blocks.append((off, w))
        off += w
    KT = off
    rng = np.random.default_rng(0)
    inc_np = np.zeros((ts.NT, 7, 8, KT), np.float32)
    n_arr = rng.poisson(K / 8, size=(ts.NT, 8))
    for ti in range(ts.NT):
        for r in range(8):
            n = min(int(n_arr[ti, r]), Wx)
            inc_np[ti, 6, r, :n] = 1.0
            inc_np[ti, :3, r, :n] = rng.uniform(0, ts.T, size=(3, n))
            inc_np[ti, 3:6, r, :n] = rng.normal(0, .1, size=(3, n))
    inc = jnp.asarray(inc_np)
    del inc_np

    def mk():
        def f(planes, alive, inc):
            def body(c, _):
                pl_, al_ = c
                pl2, al2 = pgx.merge_rows_g(al_, inc, pl_, tuple(blocks))
                return (pl2, al2), al2[0, 0]
            return jax.lax.scan(body, (planes, alive), None, length=REPS)
        return _jit(f)
    timeit("mg    ", mk, planes0, al, inc,
           rethread=lambda o, a: (o[0][0], o[0][1], a[2]))

if "full" in WHAT:
    def mk():
        def f(planes, alive):
            def body(c, _):
                pl_, al_ = c
                pl2, al2, d = pgx.rebucket_exchange_all_rows_g(
                    pl_, al_, ts.ntiles, ts.T, Ks, KU=KU)
                return (pl2, al2), d
            return jax.lax.scan(body, (planes, alive), None, length=REPS)
        return _jit(f)
    timeit("full  ", mk, planes0, al,
           rethread=lambda o, a: (o[0][0], o[0][1]))

if "mid" in WHAT:
    # production-like: 4 scheduled pic_steps (real wander -> real
    # leavers) then one electron rebucket; vs the same without the
    # rebucket.  Difference = the PRODUCTION rebucket cost incl. glue.
    from pinc_tpu.ops import pallas_tiled as ptl
    charge = tuple(float(c) for c in np.asarray(sim.params.charge))
    qm = tuple(float(c / m) for c, m in
               zip(charge, np.asarray(sim.params.mass)))
    P = ts.P
    ep0 = jnp.zeros((ts.NT, 3 * P, P * P), jnp.bfloat16)
    plans = sim._mid_margins(0, slow_full=False)

    def mk_mid(with_reb):
        def f(stt):
            def body(c, _):
                stc, ep = c
                for margins in plans:
                    tiles, lp2, vl2, vdot, _ = ptl.pic_step(
                        ep, stc.lpos, stc.vel, stc.alive, charge, qm, ts,
                        mxu_dtype=jnp.bfloat16, margins=margins)
                    s_ = jnp.sum(tiles[0, 0, :8]) * 0.0
                    ep = ep + s_.astype(ep.dtype)
                    stc = type(stt)(lpos=lp2, vel=vl2, alive=stc.alive)
                if with_reb:
                    stc, d = sim._rebucket(stc, species=(0,))
                return (stc, ep), 0.0
            return jax.lax.scan(body, (stt, ep0), None, length=REPS)
        return _jit(f, donate_argnums=(0,))
    for label, wr in (("mid4nr", False), ("mid4r ", True)):
        timeit(label, lambda wr=wr: mk_mid(wr), st,
               rethread=lambda o, a: (o[0][0],))

print("done", flush=True)
