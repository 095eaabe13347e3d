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
