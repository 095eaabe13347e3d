"""Headline benchmark: particle-steps/sec/chip on a 128^3 warm Maxwellian
plasma (BASELINE.md target: >= 1e9 on a v5e chip, push + deposit + field
solve all on device).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus auxiliary metrics (Poisson solve ms at 128^3) on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.utils.jaxconfig import enable_compilation_cache

enable_compilation_cache()

BASELINE_PSTEPS = 1.0e9   # particle-steps/sec/chip target from BASELINE.json


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_pic(grid_n=128, ppc=32, steps=20, layout="tiled",
              vth="0.02,0.0005", rebucket=None, fresh=False):
    from pinc_tpu.config import PincConfig
    from pinc_tpu.simulation import Simulation
    from pinc_tpu.tiled_sim import TiledSimulation

    deck = f"""
[time]
nTimeSteps = {steps}
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = {grid_n},{grid_n},{grid_n}
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = {ppc} pc
nAlloc = {ppc} pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = {vth}
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
    if rebucket:
        # pin a uniform re-bucket cadence.  Measured 2026-08-19 (HEAD,
        # exact-transport exchange): on the margin-2 Debye deck the
        # auto split cadences WIN (4.4e8 vs 2.9e8 pinned-uniform-4 —
        # the ion re-bucket every ~172 steps amortizes the exchange),
        # so the headline deck does NOT pin; the margin-1 deck keeps
        # its r02 uniform cadence 10.
        deck += f"rebucketEvery = {rebucket}\n"
    cfg = PincConfig.from_string(deck)
    t0 = time.monotonic()
    if layout == "tiled":
        sim = TiledSimulation(cfg, seed=1)
        carry = sim.state
        n_particles = int(jax.device_get(sim.state.alive.sum()))
        sim.state = None      # release so run_n's donation can take effect
        leaf = lambda c: c.lpos
    else:
        sim = Simulation(cfg, seed=1)
        carry = (sim.particles, None)
        n_particles = int(np.asarray(sim.particles.counts()).sum())
        leaf = lambda c: c[0].cell
    log(f"setup: {grid_n}^3 grid, {n_particles:,} particles, "
        f"layout={layout} ({time.monotonic()-t0:.1f}s)")

    if layout == "tiled":
        # size the window to the slow species' re-bucket cadence: every
        # species is then freshly re-bucketed at window boundaries
        # (including in-window, at the window's own end), which keeps
        # back-to-back windows honest — each window carries ALL of its
        # own re-bucket cost
        Rs = sim.rebucket_every_s
        Ri, Re = max(Rs), min(Rs)
        if Ri % Re == 0 and Ri <= 400:
            steps = Ri * max(1, round(steps / Ri))
        log(f"window: {steps} steps (cadences {Rs})")

    run_n = (sim.make_scan_steps(steps, donate=True, fresh=fresh)
             if layout == "tiled" else sim.make_scan_steps(steps))
    t0 = time.monotonic()
    if layout == "tiled":
        carry, (_, _, dropped0) = run_n(carry)
    else:
        carry, _ = run_n(*carry)
        dropped0 = 0
    jax.block_until_ready(leaf(carry))
    compile_time = time.monotonic() - t0
    log(f"compile+first run: {compile_time:.1f}s (dropped={int(dropped0)})")

    if layout == "tiled":
        # adaptive retune between windows (heating decks outgrow the
        # initial cadence/cap estimates); rebuild the scan fn when the
        # schedule changed so the timed window runs drop-free.  Only on
        # drops: an unconditional retune re-derives per-species split
        # cadences, undoing the uniform-cadence pin above (measured
        # 2026-08-19: cadence 4 -> [4,172], 6.3e8 -> 4.4e8)
        if int(dropped0) and sim.retune(carry, drops=int(dropped0)):
            Rs = sim.rebucket_every_s
            Ri, Re = max(Rs), min(Rs)
            if Ri % Re == 0 and Ri <= 400:
                steps = Ri * max(1, round(steps / Ri))
            run_n = sim.make_scan_steps(steps, donate=True, fresh=fresh)
            t0 = time.monotonic()
            carry, _ = run_n(carry)
            jax.block_until_ready(leaf(carry))
            log(f"retuned schedule: cadences={sim.rebucket_every_s}, "
                f"cap={sim._exchange_cap} (recompile "
                f"{time.monotonic()-t0:.1f}s)")

    # timed window, re-run retuned if it dropped particles: a heating
    # deck can outgrow its cadence/cap mid-window, and a headline number
    # that lost particles is not a clean number (the r03 verdict).  Each
    # retry pays a recompile, so bound the attempts.
    for attempt in range(3):
        t0 = time.monotonic()
        if layout == "tiled":
            carry, (ke, pe, dropped) = run_n(carry)
        else:
            carry, (ke, pe) = run_n(*carry)
            dropped = 0
        jax.block_until_ready(leaf(carry))
        wall = time.monotonic() - t0
        psteps = n_particles * steps / wall
        log(f"{steps} steps in {wall:.3f}s -> {psteps:.3e} "
            f"particle-steps/s (KE[-1]={float(ke[-1].sum()):.4g}, "
            f"dropped={int(dropped)})")
        if not int(dropped) or layout != "tiled" or attempt == 2:
            break
        if not sim.retune(carry, drops=int(dropped)):
            break
        Rs = sim.rebucket_every_s
        Ri, Re = max(Rs), min(Rs)
        if Ri % Re == 0 and Ri <= 400:
            steps = Ri * max(1, round(steps / Ri))
        run_n = sim.make_scan_steps(steps, donate=True, fresh=fresh)
        t0 = time.monotonic()
        carry, _ = run_n(carry)
        jax.block_until_ready(leaf(carry))
        log(f"timed window dropped particles -> retuned "
            f"(cadences={sim.rebucket_every_s}, cap={sim._exchange_cap}, "
            f"recompile {time.monotonic()-t0:.1f}s); re-running")
    if int(dropped):
        log(f"WARNING: {int(dropped)} particle(s) dropped by re-bucket "
            f"overflow during the timed window (raise tiles:slack / "
            f"tiles:exchangeCap)")
    return psteps, int(dropped)


def bench_solver(grid_n=128, reps=10):
    from pinc_tpu.solvers.spectral import SpectralSolver
    from pinc_tpu.solvers.multigrid import MultigridSolver

    rng = np.random.default_rng(0)
    rho = jnp.asarray(rng.normal(size=(grid_n,) * 3).astype(np.float32))
    out = {}
    for name, solver in [
        ("fft", jax.jit(SpectralSolver((grid_n,) * 3))),
        ("mg_vcycle", jax.jit(MultigridSolver(
            (grid_n,) * 3, n_levels=5, n_pre=3, n_post=3, n_coarse=8,
            max_cycles=1, tol=0.0))),
    ]:
        phi = solver(rho)
        jax.block_until_ready(phi)
        t0 = time.monotonic()
        for _ in range(reps):
            phi = solver(rho)
        jax.block_until_ready(phi)
        ms = (time.monotonic() - t0) / reps * 1e3
        out[name] = ms
        log(f"{name} @ {grid_n}^3: {ms:.2f} ms")
    return out


def _factor_mesh(n: int, nd: int = 3):
    dims = [1] * nd
    remaining, primes, d = n, [], 2
    while d * d <= remaining:
        while remaining % d == 0:
            primes.append(d)
            remaining //= d
        d += 1
    if remaining > 1:
        primes.append(remaining)
    for p in sorted(primes, reverse=True):
        dims[dims.index(min(dims))] *= p
    return tuple(sorted(dims))


def bench_multichip(steps=None):
    """Weak-scaling scale-out bench (input/bench_scaleout.ini): the
    single-chip per-device workload sharded over ALL visible devices.
    One command when pod hardware appears; CPU meshes validate the
    sharding at tiny shapes."""
    from pinc_tpu.config import PincConfig
    from pinc_tpu.parallel.tiled_pic import ShardedTiledSimulation

    devices = jax.devices()
    n = len(devices)
    on_tpu = devices[0].platform != "cpu"
    nsub = _factor_mesh(n)
    local = 128 if on_tpu else 16
    ppc = 32 if on_tpu else 2
    steps = steps or (40 if on_tpu else 2)
    over = [f"grid:nSubdomains={','.join(map(str, nsub))}",
            f"grid:trueSize={local},{local},{local}",
            f"population:nParticles={ppc} pc",
            f"population:nAlloc={ppc} pc",
            f"time:nTimeSteps={steps}"]
    cfg = PincConfig.from_file("input/bench_scaleout.ini", over)
    t0 = time.monotonic()
    sim = ShardedTiledSimulation(cfg, seed=1, devices=devices)
    n_particles = int(jax.device_get(sim.state.alive.sum()))
    carry = sim.state
    sim.state = None
    log(f"setup: {nsub} mesh x {local}^3 local, {n_particles:,} particles "
        f"({time.monotonic()-t0:.1f}s)")
    run_n = sim.make_scan_steps(steps, donate=True)
    t0 = time.monotonic()
    carry, _ = run_n(carry)
    jax.block_until_ready(carry.lpos)
    log(f"compile+first window: {time.monotonic()-t0:.1f}s")
    t0 = time.monotonic()
    carry, (ke, pe, dropped) = run_n(carry)
    jax.block_until_ready(carry.lpos)
    wall = time.monotonic() - t0
    psteps = n_particles * steps / wall
    log(f"{steps} steps on {n} device(s): {psteps:.3e} particle-steps/s "
        f"({psteps / n:.3e}/chip), dropped={int(dropped)}")
    print(json.dumps({
        "metric": "particle_steps_per_sec_multichip",
        "value": psteps, "unit": "particle-steps/s",
        "vs_baseline": psteps / (BASELINE_PSTEPS * n),
        "aux": {"devices": n, "mesh": list(nsub),
                "per_chip": psteps / n}}))
    return psteps


def main():
    if "--multichip" in sys.argv:
        steps = None
        if "--steps" in sys.argv:
            steps = int(sys.argv[sys.argv.index("--steps") + 1])
        bench_multichip(steps=steps)
        return
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    import os
    t_start = time.monotonic()
    on_tpu = dev.platform != "cpu"
    grid_n = 128 if on_tpu else 32
    # per-species particles per cell.  The reference's canonical decks
    # run 64-70 ppc (langmuirCold.ini:38, bepiColombo.ini:46); higher ppc
    # amortizes the per-step field work (fold+solve+gradient+pad) over
    # more particle-steps, which is the production operating point.
    ppc = int(os.environ.get("BENCH_PPC", "32" if on_tpu else "4"))
    steps = 40 if on_tpu else 5

    solver_ms = bench_solver(grid_n=grid_n, reps=10 if on_tpu else 2)
    # HEADLINE: the Debye-resolved warm Maxwellian (lambda_D = 0.5 dx) —
    # the physically honest reading of BASELINE.md's "128^3 warm
    # Maxwellian" (the reference's canonical decks all resolve lambda_D,
    # langmuirCold.ini:24); the 10k-step drift record in PARITY.md is
    # measured at this operating point
    # fresh=True: the per-step margin schedule (pic_step kernels at the
    # margin particles can actually have reached since the last re-bucket)
    # re-measured a clear win in round 5 once the exchange transport was
    # exact — 161 vs 192 ms/step chained at this deck (r3's negative was
    # measured against the corrupt-transport exchange's cadences)
    psteps, dropped = bench_pic(grid_n=grid_n, ppc=ppc, steps=steps,
                                vth="0.1,0.0023", fresh=True)
    aux = {f"poisson_{k}_ms_{grid_n}3": v for k, v in solver_ms.items()}
    aux["dropped_in_window"] = dropped
    budget = float(os.environ.get("BENCH_BUDGET_S", "420"))
    if (on_tpu and "--skip-underresolved" not in sys.argv
            and time.monotonic() - t_start < budget):
        # the under-resolved deck (lambda_D = 0.1 dx, violent CIC grid
        # heating) exercises the kernel-bound margin-1 fast path; kept
        # as an aux number (it was the pre-round-3 headline).  Budget-
        # gated and best-effort: the headline JSON must print even if a
        # cold tunneled device drags compiles past the driver timeout.
        try:
            psteps_u, dropped_u = bench_pic(grid_n=grid_n, ppc=ppc,
                                            steps=steps, rebucket=10)
            aux["underresolved_psteps"] = psteps_u
            aux["underresolved_vs_baseline"] = psteps_u / BASELINE_PSTEPS
            aux["underresolved_dropped"] = dropped_u
        except Exception as e:          # noqa: BLE001
            log(f"underresolved aux deck failed: {e!r}")
            aux["underresolved_error"] = str(e)

    # kernel-floor regression gate (VERDICT r4 item 4): the FFT/MG/pic
    # numbers above must sit inside the recorded per-platform envelope.
    # Reuses THIS process's measurements where it can (fft/mg) so the
    # gate costs only the pic-floor deck; failures are loud on stderr
    # but never break the headline JSON line.
    try:
        sys.path.insert(0, "script")
        import bench_floors
        envs = (json.loads(bench_floors.ENVELOPE_FILE.read_text())
                if bench_floors.ENVELOPE_FILE.exists() else {})
        env = envs.get(dev.platform)
        if env is None:
            log(f"floors: no envelope recorded for {dev.platform!r} — "
                f"run script/bench_floors.py --record")
            aux["floors"] = "no-envelope"
        else:
            checks = {"fft_ms": solver_ms.get("fft"),
                      "mg_vcycle_ms": solver_ms.get("mg_vcycle")}
            checks.update(bench_floors.measure_pic_step(
                grid_n=64 if on_tpu else 16, ppc=32 if on_tpu else 4))
            fails = []
            for k, v in checks.items():
                lim = env.get(k)
                if lim is None or v is None:
                    continue
                ok = v <= lim * bench_floors.TOLERANCE
                log(f"floors {'PASS' if ok else 'FAIL'} {k}: {v:.4g} "
                    f"(envelope {lim:.4g}, limit "
                    f"{lim * bench_floors.TOLERANCE:.4g})")
                if not ok:
                    fails.append(k)
            aux["floors"] = "ok" if not fails else f"FAIL:{','.join(fails)}"
    except Exception as e:          # noqa: BLE001
        log(f"floors check failed to run: {e!r}")
        aux["floors"] = f"error: {e}"

    print(json.dumps({
        "metric": "particle_steps_per_sec_per_chip",
        "value": psteps,
        "unit": "particle-steps/s",
        "vs_baseline": psteps / BASELINE_PSTEPS,
        "aux": aux,
    }))


if __name__ == "__main__":
    main()
