#!/usr/bin/env python
"""Generate a 3D rectangular flat-plate Lagrangian body file.

The plate has chord c (x before rotation), span s (z), zero thickness, and
is pitched by the angle of attack about the z axis through the origin.
Point spacing ds should match the local grid spacing (the reference's 3D
flat-plate case: examples/decoupledibpm/flatplate3dRe100_GPU, AoA sweep).

Usage: python make_flatplate_body.py [--aoa 10] [--out flatplate.body]
"""

import argparse
import math


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chord", type=float, default=1.0)
    ap.add_argument("--span", type=float, default=2.0)
    ap.add_argument("--ds", type=float, default=0.04)
    ap.add_argument("--aoa", type=float, default=0.0, help="degrees")
    ap.add_argument("--out", default="flatplate.body")
    args = ap.parse_args()

    nc = int(round(args.chord / args.ds)) + 1
    ns = int(round(args.span / args.ds)) + 1
    a = math.radians(args.aoa)
    ca, sa = math.cos(a), math.sin(a)
    pts = []
    for i in range(nc):
        x0 = -args.chord / 2 + i * args.chord / (nc - 1)
        # pitch about z through the mid-chord: +AoA raises the leading edge
        # (pitch-up; the upstream end x0=-c/2 maps to y=+x0*(-sin a) > 0),
        # matching the reference's -aoa rotation convention
        x, y = x0 * ca, -x0 * sa
        for k in range(ns):
            z = -args.span / 2 + k * args.span / (ns - 1)
            pts.append((x, y, z))

    with open(args.out, "w") as fh:
        fh.write(f"{len(pts)}\n")
        for x, y, z in pts:
            fh.write(f"{x:.10e}\t{y:.10e}\t{z:.10e}\n")
    print(f"wrote {len(pts)} points to {args.out}")


if __name__ == "__main__":
    main()
