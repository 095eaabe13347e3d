"""Ablate the mega scan body: isolate kernel vs fold vs solve vs pad."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from pinc_tpu.utils.jaxconfig import enable_compilation_cache
enable_compilation_cache()
from pinc_tpu.config import PincConfig
from pinc_tpu.tiled_sim import TiledSimulation, TiledState
from pinc_tpu.grid import gradient, potential_energy
from pinc_tpu.ops import tiled as tl
from pinc_tpu.ops import pallas_tiled as ptl

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
print(f"setup {time.monotonic()-t0:.0f}s B={sim.ts.B}", flush=True)
sim.particles = None
st = sim.state
sim.state = None
ts = sim.ts
charge = tuple(float(c) for c in np.asarray(sim.params.charge))
qm = tuple(float(c / m) for c, m in
           zip(charge, np.asarray(sim.params.mass)))
mxu = sim._mxu_dtype

rho0, phi0, E0 = jax.jit(sim._fields)(st)
ep5 = jax.jit(lambda E: tl.pad_tiles(E, ts).reshape(
    (ts.NT,) + (ts.P,) * 3 + (3,)))(E0)

R = 10


def scan_of(body):
    @jax.jit
    def run(st, ep5):
        def b(carry, _):
            return body(carry), ()
        (st2, ep5_2), _ = jax.lax.scan(b, (st, ep5), None, length=R)
        return st2, ep5_2
    return run


def kernel_only(carry):
    st, ep5 = carry
    tiles, lpos, vel, vdot, _ = ptl.pic_step(
        ep5, st.lpos, st.vel, st.alive, charge, qm, ts, mxu_dtype=mxu)
    ep5b = ep5 + 0.0 * tiles[0, 0, 0]
    return TiledState(lpos=lpos, vel=vel, alive=st.alive), ep5b


def kernel_fold(carry):
    st, ep5 = carry
    tiles, lpos, vel, vdot, _ = ptl.pic_step(
        ep5, st.lpos, st.vel, st.alive, charge, qm, ts, mxu_dtype=mxu)
    rho = tl.fold_to_global(
        tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)
    ep5b = ep5 + 0.0 * rho[0, 0, 0]
    return TiledState(lpos=lpos, vel=vel, alive=st.alive), ep5b


def kernel_fold_solve(carry):
    st, ep5 = carry
    tiles, lpos, vel, vdot, _ = ptl.pic_step(
        ep5, st.lpos, st.vel, st.alive, charge, qm, ts, mxu_dtype=mxu)
    rho = tl.fold_to_global(
        tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)
    phi = sim.solver(rho)
    ep5b = ep5 + 0.0 * phi[0, 0, 0]
    return TiledState(lpos=lpos, vel=vel, alive=st.alive), ep5b


def full(carry):
    st, ep5 = carry
    tiles, lpos, vel, vdot, _ = ptl.pic_step(
        ep5, st.lpos, st.vel, st.alive, charge, qm, ts, mxu_dtype=mxu)
    rho = tl.fold_to_global(
        tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)
    phi = sim.solver(rho)
    E = -gradient(phi)
    ep5b = tl.pad_tiles(E, ts).reshape((ts.NT,) + (ts.P,) * 3 + (3,))
    return TiledState(lpos=lpos, vel=vel, alive=st.alive), ep5b


def full_pe(carry):
    st, ep5 = carry
    tiles, lpos, vel, vdot, _ = ptl.pic_step(
        ep5, st.lpos, st.vel, st.alive, charge, qm, ts, mxu_dtype=mxu)
    rho = tl.fold_to_global(
        tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)
    phi = sim.solver(rho)
    E = -gradient(phi)
    pe = potential_energy(rho, phi)
    ep5b = tl.pad_tiles(E, ts).reshape((ts.NT,) + (ts.P,) * 3 + (3,))
    ep5b = ep5b + 0.0 * pe
    return TiledState(lpos=lpos, vel=vel, alive=st.alive), ep5b


prev = 0.0
for name, body in [("pic_step only", kernel_only),
                   ("+ fold_to_global", kernel_fold),
                   ("+ solver", kernel_fold_solve),
                   ("+ grad + pad_tiles", full),
                   ("+ potential_energy", full_pe)]:
    dt, (st, ep5) = timeit(scan_of(body), st, ep5)
    ms = dt / R * 1e3
    print(f"{name:22s} {ms:7.2f} ms/step  (+{ms-prev:5.2f})", flush=True)
    prev = ms


def full_cmajor(carry):
    st, ep5 = carry
    tiles, lpos, vel, vdot, _ = ptl.pic_step(
        ep5, st.lpos, st.vel, st.alive, charge, qm, ts, mxu_dtype=mxu)
    rho = tl.fold_to_global(
        tiles.reshape((ts.NT,) + (ts.P,) * 3), ts)
    phi = sim.solver(rho)
    E = -gradient(phi)
    pe = potential_energy(rho, phi)
    ep5b = tl.pad_tiles_cmajor(E, ts) + 0.0 * pe
    return TiledState(lpos=lpos, vel=vel, alive=st.alive), ep5b


for name, body in [("full cmajor pad A", full_cmajor),
                   ("full (5D pad) again", full_pe),
                   ("full cmajor pad B", full_cmajor)]:
    dt, (st, ep5x) = timeit(scan_of(body), st,
                            ep5 if body is full_pe else
                            tl.pad_tiles_cmajor(jnp.zeros(ts.grid + (3,),
                                                          jnp.float32), ts))
    ms = dt / R * 1e3
    print(f"{name:22s} {ms:7.2f} ms/step", flush=True)
