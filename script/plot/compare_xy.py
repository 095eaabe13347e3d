#!/usr/bin/env python3
"""Compare a time-series dataset across runs — equivalent of the
reference's ``script/plot/compareXY.py``: overlays one ``.xy.h5``
dataset (default total kinetic energy) from several output directories
or files.

Usage: python script/plot/compare_xy.py run1/history.xy.h5 run2/... \
           [--dataset energy/kinetic/total] [--out compare.png] [--rel]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import h5py
import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--dataset", default="energy/kinetic/total")
    ap.add_argument("--out", default="compare.png")
    ap.add_argument("--rel", action="store_true",
                    help="plot relative to each curve's first value")
    args = ap.parse_args(argv)

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for path in args.files:
        with h5py.File(path) as f:
            xy = np.asarray(f[args.dataset])
        y = xy[:, 1]
        if args.rel:
            y0 = y[np.argmax(y != 0)] if (y != 0).any() else 1.0
            y = (y - y0) / abs(y0)
        ax.plot(xy[:, 0], y, label=Path(path).parent.name or path)
    ax.set_xlabel("timestep")
    ax.set_ylabel(args.dataset + (" (relative)" if args.rel else ""))
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
