#!/usr/bin/env python3
"""Line cut of a grid quantity along one axis — equivalent of the
reference's ``script/plot/plotAlongX.py``: plots the quantity along the
chosen axis (other indices fixed, default mid-plane) at one or more
timesteps.

Usage: python script/plot/plot_along_x.py data/phi.grid.h5 [out.png]
           [--axis 0] [--times first,last] [--component 0]
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
from reader import read_grid, timesteps  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("h5file")
    ap.add_argument("out", nargs="?", default="along_x.png")
    ap.add_argument("--axis", type=int, default=0)
    ap.add_argument("--times", default="first,last",
                    help="comma list of timesteps, or first/last/all")
    ap.add_argument("--component", type=int, default=0,
                    help="values component for vector grids")
    args = ap.parse_args(argv)

    with h5py.File(args.h5file) as f:
        ts = timesteps(f)
        want = []
        for tok in args.times.split(","):
            tok = tok.strip()
            if tok == "first":
                want.append(ts[0])
            elif tok == "last":
                want.append(ts[-1])
            elif tok == "all":
                want.extend(ts)
            else:
                want.append(min(ts, key=lambda x: abs(x - float(tok))))
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for t in dict.fromkeys(want):
            a = read_grid(f, t)
            if a.ndim == 4:
                a = a[..., args.component]
            a = np.moveaxis(a, args.axis, 0)
            while a.ndim > 1:
                a = a[:, a.shape[1] // 2]
            ax.plot(a, label=f"t={t:g}")
    ax.set_xlabel(f"node index (axis {args.axis})")
    ax.set_ylabel(Path(args.h5file).stem.split(".")[0])
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
