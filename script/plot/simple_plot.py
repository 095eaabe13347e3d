#!/usr/bin/env python3
"""Plot any time-series dataset of a ``.xy.h5`` file — equivalent of the
reference's script/plot/simplePlot.py (which pylab-plots one hardcoded
dataset) generalized to any path.

Usage: python script/plot/simple_plot.py data/history.xy.h5 \
           [/energy/kinetic/total] [out.png]
"""

from __future__ import annotations

import sys

import h5py
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    path = argv[0]
    dset = argv[1] if len(argv) > 1 else "/energy/kinetic/total"
    out = argv[2] if len(argv) > 2 else "simple.png"
    with h5py.File(path) as f:
        data = np.asarray(f[dset])
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(data[:, 0], data[:, 1], lw=1.2)
    ax.set_xlabel("timestep")
    ax.set_ylabel(dset)
    ax.set_title(f"{path}:{dset}")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out} ({data.shape[0]} points)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
