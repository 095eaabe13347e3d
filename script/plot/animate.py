#!/usr/bin/env python3
"""Animate a grid quantity over the run — equivalent of the reference's
``script/plot/animate.py``: one frame per stored timestep, mid-plane slice
for 3D grids, saved as an animated GIF (no ffmpeg dependency).

Usage: python script/plot/animate.py data/rho.grid.h5 [out.gif]
           [--axis 2] [--index mid] [--fps 10]
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
from matplotlib import animation  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent))
from reader import read_grid, timesteps  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("h5file")
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--axis", type=int, default=2, help="slice axis (3D)")
    ap.add_argument("--index", default="mid", help="slice index or 'mid'")
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--every", type=int, default=1, help="frame stride")
    args = ap.parse_args(argv)
    out = args.out or (Path(args.h5file).stem.split(".")[0] + ".gif")

    with h5py.File(args.h5file) as f:
        ts = timesteps(f)[::args.every]
        if not ts:
            print("no n=<t> datasets found")
            return 2
        frames = []
        for t in ts:
            a = read_grid(f, t)
            if a.ndim > 2:
                i = (a.shape[args.axis] // 2 if args.index == "mid"
                     else int(args.index))
                a = np.take(a, i, axis=args.axis)
            if a.ndim > 2:                    # vector field: magnitude
                a = np.linalg.norm(a, axis=-1)
            frames.append(a)

    vmax = max(abs(float(np.min(frames))), abs(float(np.max(frames))), 1e-30)
    fig, ax = plt.subplots(figsize=(5, 4.2))
    if frames[0].ndim == 1:
        (line,) = ax.plot(frames[0])
        ax.set_ylim(-vmax, vmax)

        def update(i):
            line.set_ydata(frames[i])
            ax.set_title(f"t = {ts[i]:g}")
            return (line,)
    else:
        im = ax.imshow(frames[0].T, origin="lower", cmap="RdBu_r",
                       vmin=-vmax, vmax=vmax)
        fig.colorbar(im, ax=ax)

        def update(i):
            im.set_data(frames[i].T)
            ax.set_title(f"t = {ts[i]:g}")
            return (im,)

    anim = animation.FuncAnimation(fig, update, frames=len(frames))
    anim.save(out, writer=animation.PillowWriter(fps=args.fps))
    print(f"wrote {out} ({len(frames)} frames)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
