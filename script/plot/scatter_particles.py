#!/usr/bin/env python3
"""Particle scatter / phase-space plot — equivalent of the reference's
``script/plot/scatterBrainedParticles.py``: positions (x, y) or phase
space (x, vx) per species at a timestep.

Usage: python script/plot/scatter_particles.py data/pop.pop.h5 [out.png]
           [--time last] [--phase] [--max 20000]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import h5py
import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from reader import species_of, timesteps  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("h5file")
    ap.add_argument("out", nargs="?", default="particles.png")
    ap.add_argument("--time", default="last")
    ap.add_argument("--phase", action="store_true",
                    help="plot (x, vx) phase space instead of (x, y)")
    ap.add_argument("--max", type=int, default=20000,
                    help="subsample to at most this many points/species")
    args = ap.parse_args(argv)

    with h5py.File(args.h5file) as f:
        species = species_of(f, "pos")
        fig, ax = plt.subplots(figsize=(6.5, 5))
        for s in species:
            gp = f[f"pos/{s}"]
            ts = timesteps(gp)
            t = ts[-1] if args.time == "last" else min(
                ts, key=lambda x: abs(x - float(args.time)))
            pos = np.asarray(gp[f"n={t:.1f}"])
            stride = max(1, len(pos) // args.max)
            pos = pos[::stride]
            if args.phase:
                gv = f[f"vel/{s}"]
                tv = min(timesteps(gv), key=lambda x: abs(x - t - 0.5))
                vel = np.asarray(gv[f"n={tv:.1f}"])[::stride]
                ax.scatter(pos[:, 0], vel[:, 0], s=1, alpha=0.4, label=s)
                ax.set_ylabel("vx")
            else:
                y = pos[:, 1] if pos.shape[1] > 1 else 0 * pos[:, 0]
                ax.scatter(pos[:, 0], y, s=1, alpha=0.4, label=s)
                ax.set_ylabel("y")
    ax.set_xlabel("x")
    ax.set_title(f"t = {t:g}" + (" (phase space)" if args.phase else ""))
    ax.legend(markerscale=6, fontsize=8)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
