#!/usr/bin/env python3
"""Filled-contour plot of a 3D grid slice — equivalent of the reference's
script/plot/3D_grid_contourf.py (fixed mid-plane contourf of a field),
with the plane and timestep selectable.

Usage: python script/plot/grid_contourf.py data/phi.grid.h5 \
           [step] [axis] [index] [out.png]
"""

from __future__ import annotations

import sys
from pathlib import Path

import h5py
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from reader import read_grid, timesteps  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    path = argv[0]
    with h5py.File(path) as f:
        ts = timesteps(f)
        step = float(argv[1]) if len(argv) > 1 else ts[-1]
        step = min(ts, key=lambda x: abs(x - step))
        grid = read_grid(f, step)
    if grid.ndim == 4:                     # vector field: magnitude
        grid = np.linalg.norm(grid, axis=-1)
    axis = int(argv[2]) if len(argv) > 2 else 2
    idx = int(argv[3]) if len(argv) > 3 else grid.shape[axis] // 2
    out = argv[4] if len(argv) > 4 else "contourf.png"
    sl = np.take(grid, idx, axis=axis)
    fig, ax = plt.subplots(figsize=(6, 5))
    cf = ax.contourf(sl.T, levels=24)
    fig.colorbar(cf, ax=ax)
    keep = [d for d in "xyz"[:grid.ndim] if d != "xyz"[axis]]
    ax.set_xlabel(keep[0])
    ax.set_ylabel(keep[1])
    ax.set_title(f"{path} n={step:g} ({'xyz'[axis]}={idx})")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
