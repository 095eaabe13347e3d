"""Native C++ component tests: ini parser parity with the Python parser,
async spooler round-trip, and the files:async end-to-end path."""

import numpy as np
import pytest

from pinc_tpu import native
from pinc_tpu.config import PincConfig

HAVE_NATIVE = native.lib() is not None

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="no C++ toolchain available")

DECK = """
; top comment
[Time]
nTimeSteps = 45    ; inline
timeStep = 0.2
[grid]
nDims=3
TrueSize = 32, 16 ,16
stepSize=6.28 tot   # hash comment
empty =
"""


def test_ini_parser_parity(tmp_path):
    p = tmp_path / "deck.ini"
    p.write_text(DECK)
    nat = native.parse_ini_native(str(p))
    ref = PincConfig()
    ref._parse(DECK.splitlines())
    assert nat == dict(ref._d)
    assert nat["time:ntimesteps"] == "45"
    assert nat["grid:truesize"] == "32, 16 ,16"
    assert nat["grid:stepsize"] == "6.28 tot"
    assert nat["grid:empty"] == ""


def test_ini_parser_missing_file():
    with pytest.raises(FileNotFoundError):
        native.parse_ini_native("/nonexistent/deck.ini")


def test_spool_roundtrip(tmp_path):
    from pinc_tpu.spool import SpoolWriter, read_spool
    path = tmp_path / "t.spool"
    w = SpoolWriter(path)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 6)).astype(np.float32)
    b = np.arange(24, dtype=np.int32).reshape(2, 3, 4)
    w.write("rho", 3.0, a)
    w.write("pop/pos/0", 3.0, b.astype(np.float32))
    n = w.close()
    assert n == 2
    recs = list(read_spool(path))
    assert recs[0][0] == "rho" and recs[0][1] == 3.0
    assert np.allclose(recs[0][2], a)
    assert recs[1][2].shape == (2, 3, 4)


def test_async_output_matches_sync(tmp_path):
    """files:async=true must produce the same .h5 contents as the
    synchronous writer."""
    import h5py
    from pinc_tpu.simulation import Simulation
    from pinc_tpu.io_h5 import OutputWriter

    deck = """
[files]
output = {out}
async = {asyn}
[time]
nTimeSteps = 4
timeStep = 0.2
[grid]
nDims = 1
nSubdomains = 1
trueSize = 32
stepSize = 6.28 tot
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 8 pc
nAlloc = 8 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
temperature = 0
perturbAmplitude = 0.001,0
perturbMode = 1,0
[methods]
mode = regular
poisson = sSolve
acc = puAccND1KE
distr = puDistrND1
migrate = puExtractEmigrantsND
"""
    results = {}
    for mode in ("false", "true"):
        out = f"{tmp_path}/{mode}/"
        cfg = PincConfig.from_string(deck.format(out=out, asyn=mode))
        sim = Simulation(cfg)
        writer = OutputWriter(cfg, sim)
        sim.run(writer=writer, progress_every=0)
        writer.close()
        with h5py.File(f"{out}rho.grid.h5") as f:
            results[mode] = {k: np.asarray(f[k]) for k in f.keys()}
        with h5py.File(f"{out}pop.pop.h5") as f:
            results[mode]["pos"] = np.asarray(f["pos/specie 0/n=2.0"])
    assert set(results["true"]) == set(results["false"])
    for k in results["false"]:
        assert np.allclose(results["false"][k], results["true"][k],
                           atol=1e-7), k
