#!/usr/bin/env python3
"""Convert a PINC .grid.h5 field to legacy-VTK structured points — the
equivalent of the reference's root ``h5tovtk.py`` (which required pyvtk);
this writes the trivially simple legacy ASCII format directly, no
dependencies.

Usage: python script/h5tovtk.py data/phi.grid.h5 [step] [out.vtk]
"""

from __future__ import annotations

import sys
from pathlib import Path

import h5py
import numpy as np


def write_vtk(path: str, data: np.ndarray, name: str = "field") -> None:
    data = np.asarray(data, dtype=np.float64)
    dims = data.shape
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 2.0\n")
        f.write("pinc_tpu field\nASCII\nDATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {' '.join(str(d) for d in dims[::-1])}\n")
        f.write("ORIGIN 0 0 0\nSPACING 1 1 1\n")
        f.write(f"POINT_DATA {data.size}\n")
        f.write(f"SCALARS {name} double 1\nLOOKUP_TABLE default\n")
        np.savetxt(f, data.reshape(-1, 1), fmt="%.9g")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    path = argv[0]
    step = float(argv[1]) if len(argv) > 1 else 0.0
    out = argv[2] if len(argv) > 2 else str(Path(path).stem) + ".vtk"
    with h5py.File(path) as f:
        data = np.asarray(f[f"n={step:.1f}"])
    if data.shape[-1] == 1:
        data = data[..., 0]
    elif data.ndim > 3:
        data = np.linalg.norm(data, axis=-1)
    write_vtk(out, data, Path(path).stem.split(".")[0])
    print(f"wrote {out} ({data.shape})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
