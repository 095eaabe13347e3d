"""Weak-scaling readiness (VERDICT item 9): growing the mesh at fixed
per-device workload must keep every per-device shape — local TileSpec,
bucket capacity, exchange cap, per-shard state block — invariant, so the
scale-out bench (input/bench_scaleout.ini, bench.py --multichip) runs
the single-chip program per chip plus ppermute halos."""

import jax
import numpy as np
import pytest

from pinc_tpu.config import PincConfig
from pinc_tpu.parallel.tiled_pic import ShardedTiledSimulation

DECK = """
[time]
nTimeSteps = 2
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = {nsub}
trueSize = 16,16,16
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 2 pc
nAlloc = 2 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = 0.1,0.002
[methods]
mode = regular
layout = tiled
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
[tiles]
tileSize = 4
margin = 1
rebucketEvery = 2
slack = 1.5
"""


def _sim(nsub):
    cfg = PincConfig.from_string(DECK.format(nsub=",".join(map(str, nsub))))
    return ShardedTiledSimulation(cfg, seed=1)


def test_weak_scaling_shape_invariance(cpu_devices):
    """(1,1,1) -> (2,2,2) at fixed trueSize: identical per-device tile
    spec, bucket size, exchange cap; per-shard state block unchanged."""
    s1 = _sim((1, 1, 1))
    s8 = _sim((2, 2, 2))
    assert s1.ts_local == s8.ts_local          # local grid/T/M/B identical
    assert s1._exchange_cap == s8._exchange_cap
    assert s1.rebucket_every_s == s8.rebucket_every_s
    # per-shard block of the sharded state: shape/device-count product
    for a1, a8 in [(s1.state.lpos, s8.state.lpos),
                   (s1.state.alive, s8.state.alive)]:
        shard1 = a1.sharding.shard_shape(a1.shape)
        shard8 = a8.sharding.shard_shape(a8.shape)
        assert shard1 == shard8, (shard1, shard8)
    # both compiled steps execute
    for s in (s1, s8):
        st, rho, phi, E, diag = s._thalf_jit(s.state)
        st, rho, phi, E, diag = s._tstep_jit(st)
        jax.block_until_ready(st.lpos)
        assert np.isfinite(float(diag.kin_energy.sum()))
        assert rho.shape == s.spec.global_size


def test_multichip_bench_runs(cpu_devices):
    """The committed scale-out command executes end-to-end on the CPU
    mesh (the one-command artifact for when pod hardware appears)."""
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "bench.py", "--multichip", "--steps", "2"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
        env=dict(__import__("os").environ,
                 JAX_PLATFORMS="cpu",
                 XLA_FLAGS="--xla_force_host_platform_device_count=8"))
    assert out.returncode == 0, out.stderr[-2000:]
    import json
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "particle_steps_per_sec_multichip"
    assert rec["aux"]["devices"] == 8 and rec["value"] > 0
