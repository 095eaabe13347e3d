#!/usr/bin/env python3
"""Energy-history plot — equivalent of the reference's script/plot energy
plots: reads ``history.xy.h5`` and plots kinetic/potential/total energy vs
timestep.

Usage: python script/plot/energy.py data/history.xy.h5 [out.png]
"""

from __future__ import annotations

import sys

import h5py
import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    path = argv[0]
    out = argv[1] if len(argv) > 1 else "energy.png"
    with h5py.File(path) as f:
        ke = np.asarray(f["energy/kinetic/total"])
        pe = np.asarray(f["energy/potential/total"])
        species = sorted(k for k in f["energy/kinetic"] if k.startswith("specie"))
        per_s = {s: np.asarray(f[f"energy/kinetic/{s}"]) for s in species}

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    ax1.plot(ke[:, 0], ke[:, 1], label="kinetic")
    ax1.plot(pe[:, 0], pe[:, 1], label="potential")
    ax1.plot(ke[:, 0], ke[:, 1] + pe[:, 1], "k--", label="total")
    ax1.set_xlabel("timestep")
    ax1.set_ylabel("energy (simulation units)")
    ax1.legend()
    ax1.grid(alpha=0.3)
    for s, data in per_s.items():
        ax2.plot(data[:, 0], data[:, 1], label=f"KE {s}")
    ax2.set_xlabel("timestep")
    ax2.legend()
    ax2.grid(alpha=0.3)
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
