#!/usr/bin/env python
"""Validate a 2D Taylor-Green vortex run against the analytic solution.

u =  cos(x) sin(y) exp(-2 nu t)
v = -sin(x) cos(y) exp(-2 nu t)

(the decaying-vortex solution the reference's
examples/navierstokes/taylorgreenvortex2dRe100 postprocessing compares to).

Usage: python validate_taylorgreen.py -directory <case> [--nu 0.01]
"""

import argparse
import glob
import os
import sys

import h5py
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-directory", default=".")
    ap.add_argument("--nu", type=float, default=0.01)
    ap.add_argument("--tol", type=float, default=5e-3)
    args = ap.parse_args()

    out = os.path.join(args.directory, "output")
    snaps = [s for s in sorted(glob.glob(os.path.join(out, "*.h5")))
             if os.path.basename(s)[0].isdigit()
             and os.path.basename(s) != "0000000.h5"]
    with h5py.File(os.path.join(out, "grid.h5")) as g:
        xu, yu = g["u/x"][:], g["u/y"][:]
        xv, yv = g["v/x"][:], g["v/y"][:]
    worst = 0.0
    for path in snaps:
        with h5py.File(path) as f:
            u, v = f["u"][:], f["v"][:]
            t = float(f["p"].attrs["time"])
        decay = np.exp(-2.0 * args.nu * t)
        ue = np.cos(xu)[None, :] * np.sin(yu)[:, None] * decay
        ve = -np.sin(xv)[None, :] * np.cos(yv)[:, None] * decay
        err = max(float(np.abs(u - ue).max()), float(np.abs(v - ve).max()))
        print(f"t = {t:8.4f}  max|err| = {err:.3e}")
        worst = max(worst, err)
    ok = worst <= args.tol
    print("PASS" if ok else f"FAIL (tol {args.tol})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
