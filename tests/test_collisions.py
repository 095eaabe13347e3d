"""Object collision machinery: vicinity-free trajectory intersection with
reflect and backscatter responses — the working version of the reference's
half-finished oVicinityParticles / oFindParticleCollisions /
oFindIntersectPoint (src/object.c:526-660) and the pReflect/pBackscatter
stubs (src/population.c:468-495).  VERDICT item 6 acceptance: a sphere
deck where reflected particles conserve energy and no particle penetrates
the surface, on flat + tiled."""

import jax.numpy as jnp
import numpy as np
import pytest

from pinc_tpu.config import PincConfig
from pinc_tpu.objects import (ObjectSystem, collide_segments, make_box,
                              make_sphere, save_domain, surface_normals)
from pinc_tpu.simulation import Simulation
from pinc_tpu.solvers.spectral import SpectralSolver


def test_surface_normals_sphere():
    """The precomputed normal field points radially outward on a sphere."""
    L = 24
    dom = make_sphere((L,) * 3, (12, 12, 12), 5.0)
    n = surface_normals(dom > 0.5)
    # sample nodes just outside the surface along +x
    v = n[18, 12, 12]
    assert v[0] > 0.9 and abs(v[1]) < 0.2 and abs(v[2]) < 0.2
    v = n[12, 12, 6]
    assert v[2] < -0.9


def test_collide_segments_reflect_plane():
    """Specular reflection off a plane wall: the normal component flips,
    tangential components and speed are conserved, and the particle ends
    outside."""
    L = 16
    dom = make_box((L,) * 3, (0, 0, 10), (L - 1, L - 1, L - 1))
    interior_id = jnp.asarray((np.rint(dom) > 0.5).astype(np.int32))
    normals = jnp.asarray(surface_normals(np.rint(dom) > 0.5))

    pos = jnp.asarray([[5.0, 5.0, 10.3]])      # after the move: inside
    vel = jnp.asarray([[0.2, -0.1, 0.8]])
    hit = jnp.asarray([True])
    p2, v2, failed = collide_segments(pos, vel, hit, interior_id, normals,
                                      (L,) * 3, "reflect")
    p2, v2 = np.asarray(p2)[0], np.asarray(v2)[0]
    assert not bool(failed[0])
    assert v2[2] == pytest.approx(-0.8, abs=1e-5)
    assert v2[0] == pytest.approx(0.2, abs=1e-5)
    assert v2[1] == pytest.approx(-0.1, abs=1e-5)
    assert p2[2] < 10.0
    # energy conserving
    assert np.linalg.norm(v2) == pytest.approx(
        float(jnp.linalg.norm(vel)), rel=1e-6)


def test_collide_segments_backscatter():
    L = 16
    dom = make_box((L,) * 3, (0, 0, 10), (L - 1, L - 1, L - 1))
    interior_id = jnp.asarray((np.rint(dom) > 0.5).astype(np.int32))
    normals = jnp.asarray(surface_normals(np.rint(dom) > 0.5))
    pos = jnp.asarray([[5.0, 5.0, 10.4]])
    vel = jnp.asarray([[0.3, 0.0, 0.9]])
    p2, v2, failed = collide_segments(pos, vel, jnp.asarray([True]),
                                      interior_id, normals, (L,) * 3,
                                      "backscatter")
    assert not bool(failed[0])
    np.testing.assert_allclose(np.asarray(v2)[0], [-0.3, 0.0, -0.9],
                               atol=1e-6)
    assert np.asarray(p2)[0, 2] < 10.0


def test_collide_segments_miss_untouched():
    """Particles not flagged as hits pass through unchanged."""
    L = 16
    dom = make_sphere((L,) * 3, (8, 8, 8), 3.0)
    interior_id = jnp.asarray((np.rint(dom) > 0.5).astype(np.int32))
    normals = jnp.asarray(surface_normals(np.rint(dom) > 0.5))
    pos = jnp.asarray([[1.0, 1.0, 1.0]])
    vel = jnp.asarray([[0.5, 0.0, 0.0]])
    p2, v2, failed = collide_segments(pos, vel, jnp.asarray([False]),
                                      interior_id, normals, (L,) * 3,
                                      "reflect")
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(pos))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(vel))


SPHERE_DECK = """
[objects]
objects = {path}
collisionType = {ctype},{ctype}
[time]
nTimeSteps = {steps}
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = 16,16,16
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 8 pc
nAlloc = 8 pc
charge = -1,1
mass = 1,100
multiplicity = auto
thermalVelocity = 0.2,0.05
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
{extra}
"""


def _sphere_cfg(tmp_path, ctype, steps=10, extra=""):
    L = 16
    dom = make_sphere((L,) * 3, (8, 8, 8), 2.5)
    path = str(tmp_path / "sphere.grid.h5")
    save_domain(path, dom)
    return PincConfig.from_string(
        SPHERE_DECK.format(path=path, ctype=ctype, steps=steps, extra=extra))


def _assert_no_penetration(sim):
    p = sim.particles
    alive = np.asarray(p.alive)
    cell = np.asarray(p.cell)
    oid = np.asarray(sim.objects.interior_id)
    ids = oid[cell[..., 0], cell[..., 1], cell[..., 2]]
    assert not (alive & (ids > 0)).any(), "alive particle inside the object"


@pytest.mark.parametrize("ctype", ["reflect", "backscatter"])
def test_sphere_collisions_flat(tmp_path, ctype):
    """Flat path: with reflect/backscatter selected, (nearly) all hits
    bounce — no alive particle penetrates the surface and almost nothing
    is absorbed (only response failures, e.g. corner starts)."""
    sim = Simulation(_sphere_cfg(tmp_path, ctype), seed=4)
    assert sim.objects.has_collisions
    n0 = int(np.asarray(sim.particles.counts()).sum())
    sim.run(progress_every=0)
    n1 = int(np.asarray(sim.particles.counts()).sum())
    _assert_no_penetration(sim)
    # the init cull removes interior-born particles; after that, bounces
    # keep the population: allow only a tiny failure fraction
    assert n1 > 0.9 * n0
    q_obj = abs(float(sim.objects.object_charge(sim.last_rho_obj)[0]))
    # absorbed charge comes only from failures, so it stays small
    assert q_obj < 0.1 * n0


def test_reflect_energy_conserving_kick_free(tmp_path):
    """With charge-free dynamics (multiplicity such that fields are
    negligible: zero charge cannot be configured, so compare speeds
    before/after one collision-heavy step window): reflection preserves
    each particle's speed — total KE drift over the window is tiny."""
    cfg = _sphere_cfg(tmp_path, "reflect", steps=8)
    sim = Simulation(cfg, seed=4)
    hist = sim.run(progress_every=0)
    ke = hist["kinetic"].sum(axis=1)
    # the plasma exchanges KE<->PE but collisions must not pump energy:
    # bound the total drift loosely above the field-energy scale
    assert abs(ke[-1] - ke[0]) < 0.2 * ke[0]


@pytest.mark.parametrize("ctype", ["reflect", "backscatter"])
def test_sphere_collisions_tiled(tmp_path, ctype):
    """Tiled production path: same no-penetration/no-absorption guarantees
    through the near-object tile plane machinery."""
    from pinc_tpu.tiled_sim import TiledSimulation
    extra = "[tiles]\ntileSize = 4\nmargin = 2\nrebucketEvery = 4\n"
    cfg = _sphere_cfg(tmp_path, ctype, extra=extra)
    cfg.set_str("methods:layout", "tiled")
    sim = TiledSimulation(cfg, seed=4)
    n0 = int(np.asarray(sim.to_particles(sim.state).counts()).sum())
    sim.run(progress_every=0)
    n1 = int(np.asarray(sim.particles.counts()).sum())
    _assert_no_penetration(sim)
    assert n1 > 0.9 * n0


def test_sphere_collisions_sharded_tiled(tmp_path, cpu_devices):
    """Sharded-tiled path: collisions compose with the device mesh."""
    from pinc_tpu.parallel.tiled_pic import ShardedTiledSimulation
    extra = "[tiles]\ntileSize = 4\nmargin = 2\nrebucketEvery = 4\n"
    cfg = _sphere_cfg(tmp_path, "reflect", steps=6, extra=extra)
    cfg.set_str("methods:layout", "tiled")
    cfg.set_str("grid:nsubdomains", "2,1,1")
    cfg.set_str("grid:truesize", "8,16,16")    # per-subdomain: 16^3 global
    sim = ShardedTiledSimulation(cfg, seed=4)
    n0 = int(np.asarray(sim.to_particles(sim.state).counts()).sum())
    sim.run(progress_every=0)
    n1 = int(np.asarray(sim.particles.counts()).sum())
    _assert_no_penetration(sim)
    assert n1 > 0.9 * n0


def test_collision_type_validation():
    L = 12
    dom = make_sphere((L,) * 3, (6, 6, 6), 2.0)
    with pytest.raises(ValueError, match="collisionType"):
        ObjectSystem.build(dom, SpectralSolver((L,) * 3), periodic=True,
                           collision_types=("bounce",))


# ---------------------------------------------------------------------------
# adhere + secondary-electron emission (pAdhere / pSecondaryElectron,
# src/population.c:468-495, stubbed in the reference)
# ---------------------------------------------------------------------------

def _build_obj(ctypes, **kw):
    import jax
    L = 16
    dom = make_box((L,) * 3, (0, 0, 10), (L - 1, L - 1, L - 1))
    solver = SpectralSolver((L,) * 3)
    return ObjectSystem.build(dom, jax.jit(solver), periodic=True,
                              collision_types=ctypes, **kw), L


def _particles(cell, frac, vel, cap=8, S=2):
    from pinc_tpu.population import Particles
    D = 3
    c = np.zeros((S, cap, D), np.int32)
    f = np.full((S, cap, D), 0.5, np.float32)
    v = np.zeros((S, cap, D), np.float32)
    a = np.zeros((S, cap), bool)
    for (s, i), (cc, ff, vv) in zip([(k // cap, k % cap)
                                     for k in range(len(cell))],
                                    zip(cell, frac, vel)):
        c[s, i], f[s, i], v[s, i], a[s, i] = cc, ff, vv, True
    return Particles(cell=jnp.asarray(c), frac=jnp.asarray(f),
                     vel=jnp.asarray(v), alive=jnp.asarray(a))


def test_adhere_kills_and_localizes_charge():
    """adhere: the impactor dies at its surface intersection and its
    charge lands on exactly one *surface* node of rho_obj (localized,
    unlike absorb's uniform spread)."""
    from pinc_tpu.population import SpeciesParams
    obj, L = _build_obj(("adhere", "adhere"))
    # one particle that crossed into the wall along +z
    p = _particles(cell=[(5, 5, 10)], frac=[(0.5, 0.5, 0.3)],
                   vel=[(0.0, 0.0, 0.8)])
    params = SpeciesParams(charge=jnp.asarray([-1.0, 1.0]),
                           mass=jnp.asarray([1.0, 100.0]))
    rho_obj = jnp.zeros((L,) * 3)
    p2, rho_obj, nf = obj.collide(p, params, rho_obj)
    assert int(p2.alive.sum()) == 0          # impactor adhered (killed)
    r = np.asarray(rho_obj)
    nz = np.argwhere(r != 0)
    assert len(nz) == 1                       # localized, one node
    sid = np.asarray(obj.surface_id)
    assert sid[tuple(nz[0])] > 0              # ... and it is a surface node
    assert r.sum() == pytest.approx(-1.0)     # the impactor's charge


def test_secondary_emission_spawns_into_free_slots():
    """secondary: each ion impact leaves the impactor for absorption and
    spawns seeYield secondaries of the electron species just outside the
    surface, moving away from it; the emitted charge is debited from the
    object surface so the total charge in (particles + rho_obj) is
    conserved."""
    from pinc_tpu.population import SpeciesParams
    obj, L = _build_obj(("absorb", "secondary"), see_yield=2, see_vth=0.3,
                        see_species=0)
    # two ion impactors (species 1), electron species has free slots
    p = _particles(cell=[(5, 5, 10), (9, 9, 10)],
                   frac=[(0.5, 0.5, 0.3), (0.5, 0.5, 0.2)],
                   vel=[(0.0, 0.0, 0.8), (0.0, 0.0, 0.7)], cap=8)
    # move impactors to species 1
    cell = jnp.zeros_like(p.cell).at[1].set(p.cell[0])
    frac = jnp.full_like(p.frac, 0.5).at[1].set(p.frac[0])
    vel = jnp.zeros_like(p.vel).at[1].set(p.vel[0])
    alive = jnp.zeros_like(p.alive).at[1].set(p.alive[0])
    from pinc_tpu.population import Particles
    p = Particles(cell=cell, frac=frac, vel=vel, alive=alive)
    params = SpeciesParams(charge=jnp.asarray([-1.0, 1.0]),
                           mass=jnp.asarray([1.0, 1836.0]))
    rho_obj = jnp.zeros((L,) * 3)
    p2, rho_obj, nf = obj.collide(p, params, rho_obj)
    # 2 impacts x yield 2 = 4 secondaries in the electron species
    assert int(p2.alive[0].sum()) == 4
    assert int(p2.alive[1].sum()) == 2        # impactors still interior
    # secondaries sit outside the object, moving away from it (v_z < 0)
    sec = np.asarray(p2.alive[0])
    cells = np.asarray(p2.cell[0])[sec]
    oid = np.asarray(obj.interior_id)
    assert (oid[cells[:, 0], cells[:, 1], cells[:, 2]] == 0).all()
    assert (np.asarray(p2.vel[0])[sec][:, 2] < 0).all()
    speeds = np.linalg.norm(np.asarray(p2.vel[0])[sec], axis=-1)
    assert speeds == pytest.approx(0.3, rel=1e-5)
    # charge conservation: emitted -4e debited from the surface
    assert float(np.asarray(rho_obj).sum()) == pytest.approx(4.0)
    # overflow discipline: with zero free slots nothing corrupts
    p_full = Particles(cell=cell, frac=frac, vel=vel,
                       alive=jnp.ones_like(alive))
    p3, _, _ = obj.collide(p_full, params, jnp.zeros((L,) * 3))
    assert int(p3.alive[0].sum()) == 8


def test_sphere_adhere_deck_runs(tmp_path):
    """Deck-level smoke: a sphere deck with adhere for both species runs;
    adhered charge lands only on surface nodes and nothing penetrates."""
    sim = Simulation(_sphere_cfg(tmp_path, "adhere", steps=6), seed=4)
    sim.run(progress_every=0)
    _assert_no_penetration(sim)
    r = np.asarray(sim.last_rho_obj)
    sid = np.asarray(sim.objects.surface_id)
    assert (r[sid == 0] == 0).all()


def test_sphere_secondary_deck_runs(tmp_path):
    """Deck-level smoke: ions emit secondaries (into electron free slots
    opened by electron absorption); the run completes with sane energy."""
    L = 16
    dom = make_sphere((L,) * 3, (8, 8, 8), 2.5)
    path = str(tmp_path / "sphere.grid.h5")
    save_domain(path, dom)
    deck = SPHERE_DECK.format(path=path, ctype="absorb", steps=6,
                              extra="")
    deck = deck.replace("collisionType = absorb,absorb",
                        "collisionType = absorb,secondary\n"
                        "seeYield = 1\nseeVth = 0.1\nseeSpecies = 0")
    sim = Simulation(PincConfig.from_string(deck), seed=4)
    hist = sim.run(progress_every=0)
    assert np.isfinite(hist["kinetic"]).all()


# ---------------------------------------------------------------------------
# adhere + secondary on the TILED production layout (VERDICT r3 item 6)
# ---------------------------------------------------------------------------

_TILES = "[tiles]\ntileSize = 4\nmargin = 2\nrebucketEvery = 4\n"


def _surviving_charge(sim, p, q):
    """Total physical charge of particles that survive the init cull
    (floor node not interior)."""
    oid = np.asarray(sim.objects.interior_id)
    cell = np.asarray(p.cell)
    alive = np.asarray(p.alive)
    ids = oid[cell[..., 0], cell[..., 1], cell[..., 2]]
    keep = alive & (ids == 0)
    return float((keep.sum(axis=1) * q).sum())


def test_sphere_adhere_deck_tiled(tmp_path):
    """Tiled adhere: impactors die at their crossings, charge lands only
    on surface nodes of rho_obj, nothing penetrates."""
    from pinc_tpu.tiled_sim import TiledSimulation
    cfg = _sphere_cfg(tmp_path, "adhere", steps=6, extra=_TILES)
    cfg.set_str("methods:layout", "tiled")
    sim = TiledSimulation(cfg, seed=4)
    sim.run(progress_every=0)
    _assert_no_penetration(sim)
    r = np.asarray(sim.last_rho_obj)
    sid = np.asarray(sim.objects.surface_id)
    assert (r[sid == 0] == 0).all()
    assert (r != 0).any()                     # something actually adhered


def test_sphere_secondary_deck_tiled(tmp_path):
    """Tiled secondary emission: ion impacts spawn electrons into free
    bucket slots of the same tile; total charge (particles + rho_obj)
    is conserved and no alive particle sits inside the object."""
    from pinc_tpu.tiled_sim import TiledSimulation
    L = 16
    dom = make_sphere((L,) * 3, (8, 8, 8), 2.5)
    path = str(tmp_path / "sphere.grid.h5")
    save_domain(path, dom)
    deck = SPHERE_DECK.format(path=path, ctype="absorb", steps=6,
                              extra=_TILES)
    deck = deck.replace("collisionType = absorb,absorb",
                        "collisionType = absorb,secondary\n"
                        "seeYield = 1\nseeVth = 0.1\nseeSpecies = 0")
    cfg = PincConfig.from_string(deck)
    cfg.set_str("methods:layout", "tiled")
    sim = TiledSimulation(cfg, seed=4)
    # total charge that SURVIVES the init cull (interior-born particles
    # are discarded without booking, src/main.c:161-166), in physical
    # (multiplicity-scaled) units — the units rho_obj is booked in
    q = np.asarray(sim.params.charge, np.float64)
    tot0 = _surviving_charge(sim, sim.to_particles(sim.state), q)
    hist = sim.run(progress_every=0)
    assert np.isfinite(hist["kinetic"]).all()
    _assert_no_penetration(sim)
    p1 = sim.particles
    tot1 = (float((np.asarray(p1.alive).sum(axis=1) * q).sum())
            + float(np.asarray(sim.last_rho_obj).sum()))
    assert tot1 == pytest.approx(tot0, abs=0.05 * np.abs(q).max())


def test_tiled_secondary_matches_flat_unit():
    """Unit-level: one ion impactor in a tiled state emits seeYield
    secondaries with the flat path's speed/direction guarantees (just
    outside the surface, moving away, |v| = seeVth)."""
    import jax
    from pinc_tpu.config import PincConfig as _PC
    from pinc_tpu.tiled_sim import TiledSimulation
    L = 16
    dom = make_box((L,) * 3, (0, 0, 10), (L - 1, L - 1, L - 1))
    path = "/tmp/_tsec_box.grid.h5"
    save_domain(path, dom)
    deck = SPHERE_DECK.format(path=path, ctype="absorb", steps=2,
                              extra=_TILES)
    deck = deck.replace("collisionType = absorb,absorb",
                        "collisionType = absorb,secondary\n"
                        "seeYield = 2\nseeVth = 0.3\nseeSpecies = 0")
    cfg = _PC.from_string(deck)
    cfg.set_str("methods:layout", "tiled")
    sim = TiledSimulation(cfg, seed=4)
    ts = sim.ts
    # hand-build a state: everything dead except one ion inside the wall
    S = 2
    lpos = jnp.zeros((S, 3, ts.NT, ts.B), jnp.float32)
    vel = jnp.zeros((S, 3, ts.NT, ts.B), jnp.float32)
    alive = jnp.zeros((S, ts.NT, ts.B), jnp.float32)
    # tile containing global (5.5, 5.5, 10.3): origin (4, 4, 8) at T=4
    from pinc_tpu.ops.tiled import tile_origins
    origins = np.asarray(tile_origins(ts))
    tidx = int(np.argwhere((origins == [4, 4, 8]).all(axis=1))[0, 0])
    lpos = lpos.at[1, :, tidx, 0].set(jnp.asarray([1.5, 1.5, 2.3]))
    vel = vel.at[1, :, tidx, 0].set(jnp.asarray([0.0, 0.0, 0.8]))
    alive = alive.at[1, tidx, 0].set(1.0)
    from pinc_tpu.tiled_sim import TiledState
    st = TiledState(lpos=lpos, vel=vel, alive=alive)
    st2, counter, rho_add = jax.jit(sim._absorb)(st)
    assert rho_add is None                    # no adhere species
    # impactor absorbed, 2 secondaries alive in species 0
    assert int(np.asarray(st2.alive[1]).sum()) == 0
    sec = np.asarray(st2.alive[0]) > 0.5
    assert int(sec.sum()) == 2
    vz = np.asarray(st2.vel[0][2])[sec]
    assert (vz < 0).all()                     # moving away from the wall
    sp = np.sqrt(sum(np.asarray(st2.vel[0][d])[sec] ** 2 for d in range(3)))
    assert sp == pytest.approx(0.3, rel=1e-5)
    # debit (physical units): counter[1] = absorbed ion (+q_i) + the
    # 2 emitted electrons' debit (+|q_e| each)
    qp = np.asarray(sim.params.charge, np.float64)
    assert float(counter[1]) == pytest.approx(qp[1] + 2 * abs(qp[0]),
                                              rel=1e-5)


def test_sphere_secondary_sharded_tiled(tmp_path, cpu_devices):
    """Sharded-tiled secondary: emission composes with the device mesh
    and conserves total charge."""
    from pinc_tpu.parallel.tiled_pic import ShardedTiledSimulation
    L = 16
    dom = make_sphere((L,) * 3, (8, 8, 8), 2.5)
    path = str(tmp_path / "sphere.grid.h5")
    save_domain(path, dom)
    deck = SPHERE_DECK.format(path=path, ctype="absorb", steps=4,
                              extra=_TILES)
    deck = deck.replace("collisionType = absorb,absorb",
                        "collisionType = absorb,secondary\n"
                        "seeYield = 1\nseeVth = 0.1\nseeSpecies = 0")
    cfg = PincConfig.from_string(deck)
    cfg.set_str("methods:layout", "tiled")
    cfg.set_str("grid:nsubdomains", "2,1,1")
    cfg.set_str("grid:truesize", "8,16,16")
    sim = ShardedTiledSimulation(cfg, seed=4)
    q = np.asarray(sim.params.charge, np.float64)
    tot0 = _surviving_charge(sim, sim.to_particles(sim.state), q)
    hist = sim.run(progress_every=0)
    assert np.isfinite(hist["kinetic"]).all()
    _assert_no_penetration(sim)
    p1 = sim.particles
    tot1 = (float((np.asarray(p1.alive).sum(axis=1) * q).sum())
            + float(np.asarray(sim.last_rho_obj).sum()))
    assert tot1 == pytest.approx(tot0, abs=0.05 * np.abs(q).max())


def test_sphere_adhere_sharded_tiled(tmp_path, cpu_devices):
    """Sharded-tiled adhere: localized surface deposits psum across the
    mesh; charge lands only on surface nodes."""
    from pinc_tpu.parallel.tiled_pic import ShardedTiledSimulation
    cfg = _sphere_cfg(tmp_path, "adhere", steps=4, extra=_TILES)
    cfg.set_str("methods:layout", "tiled")
    cfg.set_str("grid:nsubdomains", "2,1,1")
    cfg.set_str("grid:truesize", "8,16,16")
    sim = ShardedTiledSimulation(cfg, seed=4)
    sim.run(progress_every=0)
    _assert_no_penetration(sim)
    r = np.asarray(sim.last_rho_obj)
    sid = np.asarray(sim.objects.surface_id)
    assert (r[sid == 0] == 0).all()
    assert (r != 0).any()
