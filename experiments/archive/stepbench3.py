"""Mega-fused scan vs kernel-pair scan at bench size (no re-buckets)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation

deck = open('/root/repo/experiments/bench_deck.ini').read()


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))
    return x


def timeit(f, *args, n=2, warmup=1):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    return (time.perf_counter() - t0) / n, out


t0 = time.monotonic()
cfg = PincConfig.from_string(deck)
sim = TiledSimulation(cfg, seed=1)
print(f"setup {time.monotonic()-t0:.0f}s mega={sim._use_mega} "
      f"K={sim._exchange_cap} B={sim.ts.B}", flush=True)
sim.particles = None
st = sim.state
sim.state = None

saved = list(sim.rebucket_every_s)
sim.rebucket_every_s = [10 ** 9] * len(saved)

run_mega = sim.make_scan_steps(10)
dt, (st, _) = timeit(run_mega, st)
print(f"mega scan: 10 steps {dt*1e3:8.1f} ms ({dt*100:.1f} ms/step)",
      flush=True)

sim.cfg.set_str("tiles:mega", "false")
assert not sim._use_mega
run_pair = sim.make_scan_steps(10)
dt, (st, _) = timeit(run_pair, st)
print(f"pair scan: 10 steps {dt*1e3:8.1f} ms ({dt*100:.1f} ms/step)",
      flush=True)

# with production rebucket cadence
sim.cfg.set_str("tiles:mega", "true")
sim.rebucket_every_s = saved
run_full = sim.make_scan_steps(20)
dt, (st, out) = timeit(run_full, st)
n_part = int(jax.device_get(st.alive.sum()))
print(f"mega+rebucket: 20 steps {dt*1e3:8.1f} ms -> "
      f"{n_part*20/dt:.3e} particle-steps/s (dropped={int(out[2])})",
      flush=True)
