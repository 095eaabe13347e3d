#!/usr/bin/env python3
"""Warm-plasma dispersion check — the BASELINE.json 'warm plasma
dispersion' criterion: run a warm 1D deck, Fourier-analyze phi(x, t), and
compare the Langmuir-branch peaks against Bohm-Gross
omega^2 = omega_p^2 + 3 k^2 v_th^2.

Usage: python verification/dispersion.py [--steps 600] [--plot out.png]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--vth", type=float, default=0.1)
    ap.add_argument("--tau", type=float, default=0.2)  # omega_p * dt
    ap.add_argument("--plot", default=None)
    args = ap.parse_args(argv)

    import jax
    from pinc_tpu.config import PincConfig
    from pinc_tpu.simulation import Simulation

    L = 64
    deck = f"""
[time]
nTimeSteps = {args.steps}
timeStep = {args.tau}
[grid]
nDims = 1
nSubdomains = 1
trueSize = {L}
stepSize = 1
boundaries = PERIODIC
[population]
nSpecies = 2
nParticles = 256 pc
nAlloc = 256 pc
charge = -1,1
mass = 1,1836
multiplicity = auto
thermalVelocity = {args.vth},0.002
[methods]
mode = regular
poisson = sSolve
acc = puAccND1KE
distr = puDistrND1
migrate = puExtractEmigrantsND
"""
    cfg = PincConfig.from_string(deck)
    sim = Simulation(cfg, seed=7)

    # record phi(x, t) every step
    out = sim._half_kick_jit(sim.particles)
    particles = out.particles
    phis = [np.asarray(out.phi)]
    for n in range(args.steps):
        out = sim._step_jit(particles, None)
        particles = out.particles
        phis.append(np.asarray(out.phi))
    data = np.stack(phis)                      # (T, L)

    # 2D spectrum: omega (per step) vs k (per cell)
    spec = np.abs(np.fft.rfft2(data - data.mean()))  # (T freq, L/2+1)
    n_t = data.shape[0]
    omegas = 2 * np.pi * np.fft.fftfreq(n_t)[: spec.shape[0]]

    print("k (2pi m/L)   omega_measured   omega_BohmGross   rel.err")
    errs = []
    for m in (1, 2, 3, 4):
        k = 2 * np.pi * m / L
        col = spec[1: n_t // 2, m]
        w_meas = abs(omegas[1 + int(np.argmax(col))])
        w_bg = np.sqrt(args.tau ** 2 + 3 * (k * args.vth) ** 2)
        err = abs(w_meas - w_bg) / w_bg
        errs.append(err)
        print(f"  m={m}: k={k:.4f}  {w_meas:.4f}  {w_bg:.4f}  {err:.2%}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imshow(np.log10(spec[: n_t // 4, :16] + 1e-12), origin="lower",
                   aspect="auto", extent=[0, 16, 0, omegas[n_t // 4]])
        ks = 2 * np.pi * np.arange(16) / L
        plt.plot(np.arange(16), np.sqrt(args.tau**2 + 3 * (ks * args.vth)**2)
                 / (2 * np.pi / n_t), "w--", lw=1, label="Bohm-Gross")
        plt.xlabel("mode m")
        plt.ylabel("omega (rad/step) bin")
        plt.legend()
        plt.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"wrote {args.plot}")
    return errs


if __name__ == "__main__":
    errs = main()
    ok = all(e < 0.15 for e in errs[:2])
    print("PASS" if ok else "FAIL", "(first two modes within 15%)")
    raise SystemExit(0 if ok else 1)
