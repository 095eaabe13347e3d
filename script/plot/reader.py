"""Shared readers for the PINC h5 output layout (io_h5.py conventions,
matching the reference's gWriteH5/pWriteH5 file format): grid datasets are
named ``n=<t>.1f`` and stored dim-reversed with a trailing values axis;
particle files group ``pos|vel / specie <s> / n=...``."""

from __future__ import annotations

import re
from typing import Dict, List

import h5py
import numpy as np

_NRE = re.compile(r"^n=([0-9.]+)$")


def timesteps(f: h5py.File | h5py.Group) -> List[float]:
    """Sorted timestep values of the 'n=<t>' datasets in a group."""
    out = []
    for k in f:
        m = _NRE.match(k)
        if m:
            out.append(float(m.group(1)))
    return sorted(out)


def read_grid(f: h5py.File, t: float) -> np.ndarray:
    """One grid snapshot in (x, y, z[, C]) layout."""
    data = np.asarray(f[f"n={t:.1f}"])
    if data.shape[-1] == 1:
        data = data[..., 0]
        nd = data.ndim
        return np.transpose(data, tuple(range(nd - 1, -1, -1)))
    nd = data.ndim - 1
    return np.transpose(data, tuple(range(nd - 1, -1, -1)) + (nd,))


def species_of(f: h5py.File, group: str = "pos") -> List[str]:
    return sorted(f[group], key=lambda s: int(s.split()[-1]))


def read_particles(f: h5py.File, t: float,
                   what: str = "pos") -> Dict[str, np.ndarray]:
    """{specie name: (N, D) array} at timestep t (pos uses integer t,
    vel is staggered at t+0.5 — pass the value that exists)."""
    out = {}
    for s in species_of(f, what):
        g = f[f"{what}/{s}"]
        ts = timesteps(g)
        tt = min(ts, key=lambda x: abs(x - t))
        out[s] = np.asarray(g[f"n={tt:.1f}"])
    return out
