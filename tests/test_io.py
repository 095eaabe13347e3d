"""HDF5 output conventions: file naming, dataset naming, layout and the
history.xy.h5 energy series — what the reference's verification scripts
consume (SURVEY.md §5 'Metrics / logging')."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from pinc_tpu.config import PincConfig
from pinc_tpu.io_h5 import GridFile, XYFile, h5_path
from pinc_tpu.simulation import Simulation
from pinc_tpu.io_h5 import OutputWriter

DECK = """
[files]
output = {out}
[time]
nTimeSteps = 3
timeStep = 0.2
[grid]
nDims = 2
nSubdomains = 1,1
trueSize = 16,8
stepSize = 6.28 tot
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 4 pc
nAlloc = 4 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
temperature = 0
perturbAmplitude = 0.001,0,0,0
perturbMode = 1,0,0,0
[methods]
mode = regular
poisson = sSolve
acc = puAccND1KE
distr = puDistrND1
migrate = puExtractEmigrantsND
"""


def test_file_naming(tmp_path):
    cfg = PincConfig.from_string(f"[files]\noutput = {tmp_path}/run/\n")
    assert str(h5_path(cfg, "rho", "grid")).endswith("run/rho.grid.h5")
    cfg2 = PincConfig.from_string(f"[files]\noutput = {tmp_path}/pre\n")
    assert str(h5_path(cfg2, "pop", "pop")).endswith("pre_pop.pop.h5")


def test_full_run_output(tmp_path):
    cfg = PincConfig.from_string(DECK.format(out=f"{tmp_path}/data/"))
    sim = Simulation(cfg)
    writer = OutputWriter(cfg, sim)
    sim.run(writer=writer, progress_every=0)
    writer.close()

    with h5py.File(tmp_path / "data" / "rho.grid.h5") as f:
        names = set(f.keys())
        assert {"n=0.0", "n=1.0", "n=2.0", "n=3.0"} <= names
        # reversed dims + trailing values axis: (y, x, 1) for our (16, 8)
        assert f["n=1.0"].shape == (8, 16, 1)
        assert "Axis denormalization factor" in f.attrs

    with h5py.File(tmp_path / "data" / "E.grid.h5") as f:
        assert f["n=1.0"].shape == (8, 16, 2)

    with h5py.File(tmp_path / "data" / "pop.pop.h5") as f:
        assert f["pos/specie 0/n=1.0"].shape == (4 * 16 * 8, 2)
        assert "vel/specie 1/n=0.5" in f
        pos = np.asarray(f["pos/specie 0/n=2.0"])
        assert pos.min() >= 0 and pos[:, 0].max() < 16 and pos[:, 1].max() < 8

    with h5py.File(tmp_path / "data" / "history.xy.h5") as f:
        ds = f["energy/kinetic/total"]
        assert ds.shape == (4, 2)
        assert np.allclose(ds[:, 0], [0, 1, 2, 3])
        assert "energy/potential/specie 1" in f


def test_grid_roundtrip(tmp_path):
    cfg = PincConfig.from_string(f"[files]\noutput = {tmp_path}/rt/\n")
    g = GridFile(cfg, "phi", n_dims=3)
    arr = np.random.default_rng(0).normal(size=(4, 5, 6)).astype(np.float32)
    g.write(7, arr)
    back = g.read(7)
    assert back.shape == (4, 5, 6)
    assert np.allclose(back, arr, atol=1e-7)
    g.close()


def test_xy_append(tmp_path):
    cfg = PincConfig.from_string(f"[files]\noutput = {tmp_path}/xy/\n")
    xy = XYFile(cfg, "history")
    xy.create("/energy/kinetic/total")
    for i in range(5):
        xy.append("/energy/kinetic/total", i, i * 2.0)
    ds = xy.f["/energy/kinetic/total"]
    assert ds.shape == (5, 2)
    assert np.allclose(ds[:, 1], [0, 2, 4, 6, 8])
    xy.close()


# ---------------------------------------------------------------------------
# multi-host (pod) IO discipline: process-0 single-file writes + per-host
# particle shard files (the reference's collective MPI-IO equivalent,
# src/grid.c:1161-1180, src/population.c:538-651) — VERDICT r3 item 7
# ---------------------------------------------------------------------------

def _mock_process(monkeypatch, idx, count):
    import jax
    monkeypatch.setattr(jax, "process_index", lambda: idx)
    monkeypatch.setattr(jax, "process_count", lambda: count)


def test_multihost_secondary_process_writes_nothing_global(tmp_path,
                                                           monkeypatch):
    """On a non-primary pod process the writer opens NO grid/history
    files and creates only its per-host pop shard file."""
    cfg = PincConfig.from_string(DECK.format(out=f"{tmp_path}/d/"))
    sim = Simulation(cfg, seed=1)
    _mock_process(monkeypatch, 2, 4)
    w = OutputWriter(cfg, sim)
    assert w.history is None and w.grids == {}
    w.write_energy(0, np.zeros(2), 0.0)       # must no-op, not crash
    w.close()
    names = sorted(p.name for p in (tmp_path / "d").iterdir())
    assert names == ["pop.p2.pop.h5"]


def test_multihost_primary_owns_single_files(tmp_path, monkeypatch):
    cfg = PincConfig.from_string(DECK.format(out=f"{tmp_path}/d/"))
    sim = Simulation(cfg, seed=1)
    _mock_process(monkeypatch, 0, 4)
    w = OutputWriter(cfg, sim)
    assert w.history is not None and set(w.grids) == {"rho", "phi", "E"}
    w.write_energy(0, np.zeros(2), 0.0)
    w.close()
    names = sorted(p.name for p in (tmp_path / "d").iterdir())
    assert "history.xy.h5" in names and "pop.p0.pop.h5" in names


def test_multihost_checkpoint_secondary_skips_write(tmp_path, monkeypatch):
    from pinc_tpu import checkpoint as ckpt
    cfg = PincConfig.from_string(DECK.format(out=f"{tmp_path}/d/"))
    sim = Simulation(cfg, seed=1)
    _mock_process(monkeypatch, 1, 4)
    # fetch_global would allgather on a real pod; single-process arrays
    # short-circuit through np.asarray via the mock-safe ndarray branch
    import pinc_tpu.utils.multihost as mh
    monkeypatch.setattr(mh, "fetch_global", lambda a: np.asarray(a))
    p = ckpt.save(cfg, 3, sim.particles)
    assert not p.exists()                      # secondary wrote nothing
    _mock_process(monkeypatch, 0, 4)
    p = ckpt.save(cfg, 3, sim.particles)
    assert p.exists()


def test_owned_rows_single_process_passthrough(tmp_path):
    cfg = PincConfig.from_string(DECK.format(out=f"{tmp_path}/d/"))
    sim = Simulation(cfg, seed=1)
    w = OutputWriter(cfg, sim)
    arr = np.arange(12).reshape(2, 6)
    out = w._owned_rows(arr)
    assert (out == arr).all()
    w.close()
