#!/usr/bin/env python3
"""Velocity-distribution histogram per species — equivalent of the
reference's ``script/plot/distribution.py``: reads a particle file,
histograms each velocity component at a chosen timestep and overlays the
matching Maxwellian.

Usage: python script/plot/distribution.py data/pop.pop.h5 [out.png]
           [--time last] [--bins 80]
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
    ap.add_argument("out", nargs="?", default="distribution.png")
    ap.add_argument("--time", default="last")
    ap.add_argument("--bins", type=int, default=80)
    args = ap.parse_args(argv)

    with h5py.File(args.h5file) as f:
        species = species_of(f, "vel")
        data = {}
        for s in species:
            g = f[f"vel/{s}"]
            ts = timesteps(g)
            t = ts[-1] if args.time == "last" else min(
                ts, key=lambda x: abs(x - float(args.time)))
            data[s] = (t, np.asarray(g[f"n={t:.1f}"]))

    ns = len(species)
    fig, axes = plt.subplots(1, ns, figsize=(5 * ns, 4), squeeze=False)
    for ax, s in zip(axes[0], species):
        t, v = data[s]
        D = v.shape[-1]
        for d in range(D):
            comp = v[:, d]
            h, edges = np.histogram(comp, bins=args.bins, density=True)
            c = 0.5 * (edges[1:] + edges[:-1])
            ax.plot(c, h, label=f"v{'xyz'[d]}")
        # overlay the Maxwellian with the measured sigma of component 0
        sig = float(v[:, 0].std()) or 1.0
        mu = float(v[:, 0].mean())
        x = np.linspace(v.min(), v.max(), 200)
        ax.plot(x, np.exp(-0.5 * ((x - mu) / sig) ** 2)
                / (sig * np.sqrt(2 * np.pi)), "k--",
                label=f"Maxwellian σ={sig:.3g}")
        ax.set_title(f"{s} (t={t:g})")
        ax.set_xlabel("velocity")
        ax.legend(fontsize=8)
    axes[0][0].set_ylabel("probability density")
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
