#!/usr/bin/env python3
"""Energy-conservation sweep — the equivalent of the reference's
``verification/sweep.py``: run Langmuir decks over a range of timeStep (or
stepSize) values, read the total energy series from ``history.xy.h5``, and
report/plot the max relative energy drift per setting
(reference sweep.py:23-82).

Usage:
    python verification/sweep.py dt [ini] [--plot out.png]
    python verification/sweep.py dx [ini] [--plot out.png]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "script"))

from framework.pinc import Pinc  # noqa: E402


def energy_drift(history_file: Path) -> float:
    import h5py
    with h5py.File(history_file) as f:
        ke = np.asarray(f["energy/kinetic/total"])[:, 1]
        pe = np.asarray(f["energy/potential/total"])[:, 1]
    tot = (ke + pe)[1:]
    return float((tot.max() - tot.min()) / abs(tot.mean()))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=["dt", "dx"])
    ap.add_argument("ini", nargs="?",
                    default=str(Path(__file__).resolve().parents[1]
                                / "input" / "langmuirCold1D.ini"))
    ap.add_argument("--plot", default=None)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args(argv)

    values = [0.05 * 2 ** k for k in range(4)] if args.what == "dt" else \
             [16 * 2 ** k for k in range(3)]
    drifts = []
    with tempfile.TemporaryDirectory() as tmp:
        for i, v in enumerate(values):
            out = f"{tmp}/run{i}/"
            ov = {"files:output": out, "time:ntimesteps": args.steps,
                  "files:writepop": "false", "files:writefields": "false"}
            if args.what == "dt":
                ov["time:timestep"] = v
            else:
                ov["grid:truesize"] = int(v)
            Pinc(args.ini, ov).run()
            d = energy_drift(Path(out) / "history.xy.h5")
            drifts.append(d)
            print(f"{args.what}={v}: max relative energy drift = {d:.3e}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.loglog(values, drifts, "o-")
        plt.xlabel(args.what)
        plt.ylabel("max relative energy drift")
        plt.grid(True, which="both", alpha=0.3)
        plt.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"wrote {args.plot}")
    return values, drifts


if __name__ == "__main__":
    main()
