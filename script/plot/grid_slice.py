#!/usr/bin/env python3
"""Field-slice plot — equivalent of the reference's grid plotting scripts:
reads a ``.grid.h5`` file, takes a 2D slice of a chosen timestep, renders a
heatmap.

Usage: python script/plot/grid_slice.py data/phi.grid.h5 [step] [axis] [out.png]
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
    step = float(argv[1]) if len(argv) > 1 else 0.0
    axis = int(argv[2]) if len(argv) > 2 else 0
    out = argv[3] if len(argv) > 3 else "slice.png"
    with h5py.File(path) as f:
        data = np.asarray(f[f"n={step:.1f}"])
    data = data[..., 0] if data.shape[-1] == 1 else np.linalg.norm(data, axis=-1)
    while data.ndim > 2:
        data = np.take(data, data.shape[axis] // 2, axis=axis)
    plt.figure(figsize=(6, 5))
    plt.imshow(data.T if data.ndim == 2 else data[None, :], origin="lower",
               cmap="RdBu_r", aspect="auto")
    plt.colorbar()
    plt.title(f"{path} n={step:.1f}")
    plt.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
