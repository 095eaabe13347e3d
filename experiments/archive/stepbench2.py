import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation
from pinc_tpu.ops import tiled as tl

deck = open('/root/repo/experiments/bench_deck.ini').read()

def _sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))
    return x

def timeit(f, *args, n=3, warmup=1):
    for _ in range(warmup):
        _sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = _sync(f(*args))
    return (time.perf_counter() - t0) / n, out

t0 = time.monotonic()
cfg = PincConfig.from_string(deck)
sim = TiledSimulation(cfg, seed=1)
print(f"setup {time.monotonic()-t0:.0f}s fused={sim._use_fused} "
      f"cadence={sim.rebucket_every_s} K={sim._exchange_cap}", flush=True)
sim.particles = None

st = sim.state
sim.state = None

# pieces first (small memory)
ts = sim.ts
tiles = jnp.zeros((ts.NT, ts.P, ts.P * ts.P), jnp.float32)
@jax.jit
def fold(t):
    return tl.fold_to_global(t.reshape((ts.NT,) + (ts.P,) * 3), ts)
dt, rho = timeit(fold, tiles)
print(f"fold_to_global:     {dt*1e3:8.2f} ms", flush=True)
del tiles

@jax.jit
def solve(r):
    return sim.solver(r)
dt, phi = timeit(solve, rho)
print(f"poisson solve:      {dt*1e3:8.2f} ms", flush=True)

from pinc_tpu.grid import gradient, potential_energy
@jax.jit
def grad_pad(p):
    E = -gradient(p)
    return tl.pad_tiles(E, ts)
dt, _ = timeit(grad_pad, phi)
print(f"gradient+pad_tiles: {dt*1e3:8.2f} ms", flush=True)

@jax.jit
def pe_f(r, p):
    return potential_energy(r, p)
dt, _ = timeit(pe_f, rho, phi)
print(f"potential_energy:   {dt*1e3:8.2f} ms", flush=True)
del rho, phi

# scans: no-rebucket vs with-rebucket
saved = list(sim.rebucket_every_s)
sim.rebucket_every_s = [10 ** 9] * len(saved)
run_plain = sim.make_scan_steps(10)
dt_plain, (st, _) = timeit(run_plain, st, n=2)
print(f"10 steps no-rebucket: {dt_plain*1e3:8.1f} ms "
      f"({dt_plain*100:.1f} ms/step)", flush=True)

sim.rebucket_every_s = [10, 10 ** 9]
run_rb = sim.make_scan_steps(10)
dt_rb, (st, _) = timeit(run_rb, st, n=2)
print(f"10 steps + 1 e-rebucket: {dt_rb*1e3:8.1f} ms "
      f"-> electron rebucket = {(dt_rb-dt_plain)*1e3:.1f} ms", flush=True)

sim.rebucket_every_s = [10 ** 9, 10]
run_rbi = sim.make_scan_steps(10)
dt_rbi, (st, _) = timeit(run_rbi, st, n=2)
print(f"10 steps + 1 i-rebucket: {dt_rbi*1e3:8.1f} ms "
      f"-> ion rebucket = {(dt_rbi-dt_plain)*1e3:.1f} ms", flush=True)
