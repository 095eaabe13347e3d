#!/usr/bin/env python3
"""Summarize the C-reference baseline runs (run_baseline.sh) into
results/c_baseline.json: throughput, mgMode solve times, energy-drift
curve statistics."""
import json
import pathlib
import re
import sys

import h5py
import numpy as np

RES = pathlib.Path(sys.argv[1])
STEPS = int(sys.argv[2])
DRIFT_STEPS = int(sys.argv[3])

out = {"protocol": "BASELINE.md; serial 1-rank shim build (see README.md)"}


def wall_of(log):
    # TIMER: Time spent:    1.90s  (aux.c tMsg format: h/m/s/ms/us/ns)
    txt = (RES / log).read_text()
    m = re.search(r"Time spent:\s*([0-9.]+)\s*(h|m(?!s)|s|ms|us|ns)", txt)
    if not m:
        return None
    v = float(m.group(1))
    scale = {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 1e-3, "us": 1e-6,
             "ns": 1e-9}[m.group(2)]
    return v * scale


def count_particles(log):
    txt = (RES / log).read_text()
    m = re.findall(r"Nr\. of particles (\d+)", txt)
    return int(m[0]) if m else None


# 1. throughput
wall = wall_of("lcold.log")
n_per_species = count_particles("lcold.log") or 0
n_total = 2 * n_per_species
if wall:
    out["langmuirCold"] = {
        "grid": "32^3", "ppc": 64, "species": 2,
        "particles_total": n_total, "steps": STEPS,
        "wall_s": wall,
        "particle_steps_per_s": n_total * STEPS / wall,
    }

# 2/3. mgMode
for name, size in (("mg64", 64), ("mg128", 128)):
    rec = {"grid": f"{size}^3"}
    f = RES / name / "timer.xy.h5"
    if f.exists():
        with h5py.File(f, "r") as h:
            if "time" in h:
                rec["solve_to_tol_ns"] = float(np.asarray(h["time"])[-1, 1])
                rec["solve_to_tol_s"] = rec["solve_to_tol_ns"] / 1e9
            if "cycles" in h:
                rec["cycles"] = float(np.asarray(h["cycles"])[-1, 1])
    txt = (RES / f"{name}.log").read_text()
    m = re.search(r"Number of Cycles: (\d+)", txt)
    if m:
        rec["cycles_printed"] = int(m.group(1))
    w = wall_of(f"{name}.log")
    if w:
        rec["wall_s"] = w
    out[name] = rec

# 4. drift curve
f = RES / "drift" / "history.xy.h5"
if f.exists():
    with h5py.File(f, "r") as h:
        kin = np.asarray(h["energy/kinetic/total"])[:, 1]
        pot = np.asarray(h["energy/potential/total"])[:, 1]
    tot = kin + pot
    # langmuirCold starts COLD (KE ~ 0), so normalizing by E(t=0) is
    # meaningless; the standard PIC drift statistic is the change over
    # the window relative to the time-averaged total energy after the
    # initial oscillation settles (first 10% discarded)
    w = max(1, len(tot) // 10)
    e_mean = float(np.mean(tot[w:])) or 1e-300
    rel = (tot - tot[w]) / abs(e_mean)
    t = np.arange(len(tot), dtype=np.float64)
    slope = np.polyfit(t[w:], tot[w:], 1)[0] / abs(e_mean)
    out["drift"] = {
        "deck": "langmuirCold.ini 32^3 (1,1,1)",
        "steps": DRIFT_STEPS,
        "E_mean": e_mean,
        "final_rel_drift": float(rel[-1]),
        "max_abs_rel_drift": float(np.abs(rel).max()),
        "drift_per_1k_steps": float(slope * 1000.0),
    }
    np.save(RES / "drift_curve.npy",
            np.stack([np.arange(len(tot)), tot]))

(RES / "c_baseline.json").write_text(json.dumps(out, indent=2) + "\n")
print(json.dumps(out, indent=2))
