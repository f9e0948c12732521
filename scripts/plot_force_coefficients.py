#!/usr/bin/env python
"""Force-coefficient histories from a forces-*.txt log.

Computes Cd = 2 Fx / (rho U^2 D) and Cl = 2 Fy / (rho U^2 D) per body
(rho = U = D = 1 in the shipped cylinder/plate cases, like the reference's
plotting scripts, reference: examples/decoupledibpm/cylinder2dRe40_GPU/
scripts/plotDragCoefficient.py behavior) and prints summary statistics
over the tail of the run; optionally plots.

Usage: python plot_force_coefficients.py -directory <case> [--tail 0.5]
"""

import argparse
import glob
import os
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-directory", default=".")
    ap.add_argument("--coeff", type=float, default=2.0,
                    help="force -> coefficient factor (2/(rho U^2 D))")
    ap.add_argument("--tail", type=float, default=0.5,
                    help="fraction of the history used for the statistics")
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()

    logs = sorted(glob.glob(os.path.join(args.directory, "output", "forces-*.txt")))
    if not logs:
        print("no forces-*.txt found", file=sys.stderr)
        return 1
    data = np.vstack([np.loadtxt(p, ndmin=2) for p in logs])
    t = data[:, 0]
    n_bodies = (data.shape[1] - 1) // 2 if data.shape[1] % 2 == 1 else None
    dim = 2 if n_bodies else 3
    if n_bodies is None:
        n_bodies = (data.shape[1] - 1) // 3

    tail = t >= t[0] + (1.0 - args.tail) * (t[-1] - t[0])
    for b in range(n_bodies):
        fx = args.coeff * data[:, 1 + dim * b]
        fy = args.coeff * data[:, 2 + dim * b]
        print(f"body {b}: Cd mean {fx[tail].mean():.4f} "
              f"(min {fx[tail].min():.4f}, max {fx[tail].max():.4f}); "
              f"Cl mean {fy[tail].mean():.4f} "
              f"(min {fy[tail].min():.4f}, max {fy[tail].max():.4f})")

    if args.plot:
        from matplotlib import pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        for b in range(n_bodies):
            ax.plot(t, args.coeff * data[:, 1 + dim * b], label=f"Cd body {b}")
            ax.plot(t, args.coeff * data[:, 2 + dim * b], "--", label=f"Cl body {b}")
        ax.set(xlabel="t", ylabel="coefficient")
        ax.legend()
        fig.tight_layout()
        out = os.path.join(args.directory, "force_coefficients.png")
        fig.savefig(out, dpi=120)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
