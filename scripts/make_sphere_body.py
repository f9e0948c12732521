#!/usr/bin/env python
"""Generate a sphere .body file with quasi-uniform point spacing.

Points are placed on a Fibonacci spiral so neighbor spacing is ~ds
everywhere (the IBM delta kernels want Lagrangian spacing matched to the
local Eulerian cell width, like the reference's cylinder examples,
reference: examples/ibpm/cylinder2dRe40/circle.body).

Usage: python make_sphere_body.py sphere.body [--radius 0.5] [--ds 0.04]
"""

import argparse
import math

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--radius", type=float, default=0.5)
    ap.add_argument("--center", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    ap.add_argument("--ds", type=float, default=0.04)
    args = ap.parse_args()

    # n points on a sphere of radius r with mean spacing ds: n ~ 4*pi*r^2/ds^2
    n = max(int(round(4.0 * math.pi * args.radius**2 / args.ds**2)), 4)
    k = np.arange(n, dtype=np.float64)
    golden = math.pi * (3.0 - math.sqrt(5.0))
    z = 1.0 - (2.0 * k + 1.0) / n
    rho = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    th = golden * k
    pts = args.radius * np.stack(
        [rho * np.cos(th), rho * np.sin(th), z], axis=1) + np.asarray(args.center)

    with open(args.path, "w") as fh:
        fh.write(f"{n}\n")
        for x, y, zz in pts:
            fh.write(f"{x:10.8e}\t{y:10.8e}\t{zz:10.8e}\n")
    print(f"wrote {n} points to {args.path}")


if __name__ == "__main__":
    main()
