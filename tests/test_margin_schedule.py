"""Per-step margin schedule (ops/pallas_tiled.pic_step margins +
tiled_sim._scan_sched): scan slots right after a re-bucket run the
kernels at the margin particles can actually have reached.  For
in-envelope particles the scheduled kernels are BIT-identical to the
full-margin ones (binary embed matmuls, identical hat weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from pinc_tpu.config import PincConfig
from pinc_tpu.ops import pallas_tiled as ptl
from pinc_tpu.ops.tiled import TileSpec, pad_tiles
from pinc_tpu.tiled_sim import TiledSimulation


def _mk_state(ts, n_sp=2, seed=0, wander=0.4):
    rng = np.random.default_rng(seed)
    NT, B = ts.NT, ts.B
    lpos = rng.uniform(wander and -wander, ts.T - 1e-3 + (wander or 0),
                       (n_sp, 3, NT, B)).astype(np.float32)
    vel = rng.normal(0, 0.05, (n_sp, 3, NT, B)).astype(np.float32)
    alive = (rng.uniform(size=(n_sp, NT, B)) < 0.7).astype(np.float32)
    return jnp.asarray(lpos), jnp.asarray(vel), jnp.asarray(alive)


def test_pic_step_margins_equivalent():
    """margins=(mg, md) < M matches the full-margin kernel for particles
    within the scheduled envelope — exactly equivalent up to f32
    summation-tree rounding (~1 ulp: the contraction pairs the same
    nonzero hat terms in a different order)."""
    ts = TileSpec(grid=(16, 16, 16), T=4, M=2, B=128, chunk=8)
    rng = np.random.default_rng(3)
    E = jnp.asarray(rng.normal(0, 0.01, (16, 16, 16, 3)).astype(np.float32))
    ep5 = pad_tiles(E, ts).reshape((ts.NT,) + (ts.P,) * 3 + (3,))
    charge = (-1.0, 1.0)
    qm = (-1.0, 1.0 / 1836.0)
    for margins in (((1, 1), (1, 1)), ((1, 2), (2, 2)), ((0, 1), (1, 1))):
        # the state must honor the scheduled gather envelope: margin-0
        # gather is only for freshly re-bucketed particles (in [0, T));
        # margin >= 1 allows up to one cell of wander
        wander = 0.4 if min(mg for mg, _ in margins) >= 1 else 0.0
        lpos, vel, alive = _mk_state(ts, wander=wander)
        full = ptl.pic_step(ep5, lpos, vel, alive, charge, qm, ts,
                            interpret=True)
        sched = ptl.pic_step(ep5, lpos, vel, alive, charge, qm, ts,
                             interpret=True, margins=margins)
        for a, b, name in zip(full, sched, "tiles pos vel ke nout".split()):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-6,
                err_msg=f"{name} margins={margins}")
        # the particle state itself is followed bit-for-bit except the
        # ~1-ulp velocity rounding; positions within 1e-6
        np.testing.assert_allclose(np.asarray(full[1]),
                                   np.asarray(sched[1]), atol=1e-6)


_DECK = """
[time]
nTimeSteps = 16
timeStep = 0.1
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = 16,16,16
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 4 pc
nAlloc = 8 pc
charge = -1,1
mass = 1,100
multiplicity = auto
thermalVelocity = 0.1,0.05
drift = 0
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
[tiles]
tileSize = 8
margin = 2
backend = pallas
rebucketEvery = 0
slack = 2.0
"""


def test_scan_sched_matches_generic():
    """The margin-scheduled scan and the generic full-margin scan produce
    the same trajectory (same re-bucket points, in-envelope kernels
    bit-identical; f32 tolerance covers rare tail outliers)."""
    cfg = PincConfig.from_string(_DECK.replace("rebucketEvery = 0", ""))
    sim = TiledSimulation(cfg, seed=2)
    sim.rebucket_every_s = [4, 8]
    sim.rebucket_every = 4
    st0 = sim.state
    run_g = sim.make_scan_steps(16)
    run_s = sim.make_scan_steps(16, fresh=True)
    st_g, (ke_g, pe_g, d_g) = run_g(st0)
    st_s, (ke_s, pe_s, d_s) = run_s(st0)
    assert int(d_g) == int(d_s)
    np.testing.assert_allclose(np.asarray(ke_g), np.asarray(ke_s),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pe_g), np.asarray(pe_s),
                               rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(st_g.lpos), np.asarray(st_s.lpos),
                               atol=1e-5)
