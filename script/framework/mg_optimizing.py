#!/usr/bin/env python3
"""Multigrid parameter search — equivalent of the reference's
``script/framework/mgOptimizing.py`` (coordinate-descent over nPreSmooth/
nPostSmooth/nCoarseSolve/mgLevels minimizing the measured solve time,
reference mgOptimizing.py:34-144), modernized: runs the in-process
``mgMode`` (which times the solve on device and reports the measured
cycle count) instead of shelling out per candidate.

Usage:
    python script/framework/mg_optimizing.py deck.ini \
        [--rounds 2] [--json out.json] [key=value ...]

Prints the best (nPre, nPost, nCoarse, mgLevels) found and the s/solve
ladder explored.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO_ROOT))


def time_settings(ini, overrides, n_pre, n_post, n_coarse, levels):
    from pinc_tpu.config import PincConfig
    from pinc_tpu.registry import RUN_MODES

    cfg = PincConfig.from_file(ini, list(overrides) + [
        f"multigrid:nPreSmooth={n_pre}",
        f"multigrid:nPostSmooth={n_post}",
        f"multigrid:nCoarseSolve={n_coarse}",
        f"multigrid:mgLevels={levels}",
        "methods:mode=mgMode",
    ])
    run = RUN_MODES.select(cfg, "methods:mode")
    res = run()
    return res["seconds"], res["cycles"], res["rms_error"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ini")
    ap.add_argument("--rounds", type=int, default=2,
                    help="coordinate-descent sweeps over all 4 parameters")
    ap.add_argument("--json", default=None, help="write results here")
    ap.add_argument("overrides", nargs="*", default=[])
    args = ap.parse_args(argv)

    from pinc_tpu.config import PincConfig
    cfg0 = PincConfig.from_file(args.ini, args.overrides)
    best = dict(n_pre=cfg0.get_int("multigrid:npresmooth", 10),
                n_post=cfg0.get_int("multigrid:npostsmooth", 10),
                n_coarse=cfg0.get_int("multigrid:ncoarsesolve", 10),
                levels=cfg0.get_int("multigrid:mglevels", 4))
    candidates = dict(
        n_pre=(1, 2, 3, 4, 6, 10, 15),
        n_post=(1, 2, 3, 4, 6, 10, 15),
        n_coarse=(5, 10, 20, 40),
        levels=tuple(range(2, 8)),
    )
    history = []

    def measure(s):
        try:
            sec, cyc, err = time_settings(args.ini, args.overrides, **s)
        except ValueError:        # level doesn't divide the grid
            return None
        rec = dict(s, seconds=sec, cycles=cyc, rms_error=err)
        history.append(rec)
        print(f"  {s} -> {sec * 1e3:.3f} ms/solve, {cyc} cycles, "
              f"err {err:.3g}")
        return rec

    base = measure(best)
    assert base is not None, "baseline settings invalid for this grid"
    best_t = base["seconds"]
    for r in range(args.rounds):
        print(f"== round {r + 1}/{args.rounds} ==")
        for key, vals in candidates.items():
            for v in vals:
                if v == best[key]:
                    continue
                trial = dict(best)
                trial[key] = v
                rec = measure(trial)
                if rec and rec["seconds"] < best_t:
                    best, best_t = trial, rec["seconds"]
                    print(f"  new best: {best} ({best_t * 1e3:.3f} ms)")
    print(f"BEST: {best} -> {best_t * 1e3:.3f} ms/solve")
    if args.json:
        Path(args.json).write_text(json.dumps(
            {"best": best, "seconds": best_t, "history": history}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
