"""L6 driver/plot scripts run against a fresh output directory (VERDICT
item 8 acceptance) — the equivalents of the reference's script/plot/*
and script/framework/mgOptimizing.py."""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

from pinc_tpu.config import PincConfig
from pinc_tpu.io_h5 import OutputWriter
from pinc_tpu.simulation import Simulation

REPO = Path(__file__).resolve().parents[1]

DECK = """
[files]
output = {out}
[time]
nTimeSteps = 4
timeStep = 0.2
[grid]
nDims = 3
nSubdomains = 1,1,1
trueSize = 16,16,16
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 4 pc
nAlloc = 4 pc
charge = -1,1
mass = 1,100
multiplicity = auto
thermalVelocity = 0.1,0.02
[methods]
mode = regular
poisson = sSolve
acc = puAcc3D1KE
distr = puDistr3D1
migrate = puExtractEmigrantsND
"""


def _load(path):
    spec = importlib.util.spec_from_file_location(Path(path).stem, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[Path(path).stem] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plots")) + "/run/"
    cfg = PincConfig.from_string(DECK.format(out=out))
    sim = Simulation(cfg, seed=2)
    writer = OutputWriter(cfg, sim)
    sim.run(writer=writer, progress_every=0)
    writer.close()
    return Path(out)


def test_energy_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/energy.py")
    out = tmp_path / "e.png"
    assert mod.main([str(outdir / "history.xy.h5"), str(out)]) in (0, None)
    assert out.exists()


def test_grid_slice_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/grid_slice.py")
    out = tmp_path / "s.png"
    rc = mod.main([str(outdir / "rho.grid.h5"), "0", "2", str(out)])
    assert rc in (0, None)
    assert out.exists()


def test_animate_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/animate.py")
    out = tmp_path / "a.gif"
    assert mod.main([str(outdir / "phi.grid.h5"), str(out)]) == 0
    assert out.exists() and out.stat().st_size > 0


def test_distribution_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/distribution.py")
    out = tmp_path / "d.png"
    assert mod.main([str(outdir / "pop.pop.h5"), str(out)]) == 0
    assert out.exists()


def test_compare_xy_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/compare_xy.py")
    out = tmp_path / "c.png"
    h = str(outdir / "history.xy.h5")
    assert mod.main([h, h, "--out", str(out), "--rel"]) == 0
    assert out.exists()


def test_plot_along_x_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/plot_along_x.py")
    out = tmp_path / "x.png"
    assert mod.main([str(outdir / "phi.grid.h5"), str(out),
                     "--times", "first,last"]) == 0
    assert out.exists()


def test_scatter_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/scatter_particles.py")
    out = tmp_path / "p.png"
    assert mod.main([str(outdir / "pop.pop.h5"), str(out), "--phase"]) == 0
    assert out.exists()


def test_mg_optimizing(tmp_path):
    """Coordinate-descent MG parameter search runs in-process and returns
    a best setting (mgOptimizing.py equivalent)."""
    import json
    ini = tmp_path / "mg.ini"
    ini.write_text(DECK.format(out="") + """
[multigrid]
mgLevels = 3
mgCycles = 10
nPreSmooth = 4
nPostSmooth = 4
nCoarseSolve = 10
""")
    mod = _load(REPO / "script/framework/mg_optimizing.py")
    out = tmp_path / "best.json"
    rc = mod.main([str(ini), "--rounds", "0", "--json", str(out),
                   "methods:poisson=mgSolve"])
    assert rc == 0
    best = json.loads(out.read_text())
    assert best["seconds"] > 0 and best["best"]["levels"] == 3


def test_simple_plot_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/simple_plot.py")
    out = tmp_path / "sp.png"
    rc = mod.main([str(outdir / "history.xy.h5"),
                   "/energy/kinetic/total", str(out)])
    assert rc in (0, None)
    assert out.exists()


def test_grid_contourf_script(outdir, tmp_path):
    mod = _load(REPO / "script/plot/grid_contourf.py")
    out = tmp_path / "cf.png"
    rc = mod.main([str(outdir / "phi.grid.h5"), "0", "2", "1", str(out)])
    assert rc in (0, None)
    assert out.exists()


def test_pumode_verification_script(tmp_path):
    mod = _load(REPO / "verification/pumode.py")
    rc = mod.main(["interp", "--plot", str(tmp_path)])
    assert rc == 0
    assert (tmp_path / "pumode_interp.png").exists()
