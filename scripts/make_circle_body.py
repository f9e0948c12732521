"""Generate a circle .body file (ASCII: count, then x y per line) with
spacing matched to the uniform-zone cell width, like the reference's
cylinder examples (reference: examples/ibpm/cylinder2dRe40/circle.body)."""
import argparse
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--radius", type=float, default=0.5)
    ap.add_argument("--center", type=float, nargs=2, default=[0.0, 0.0])
    ap.add_argument("--ds", type=float, default=0.025)
    args = ap.parse_args()
    n = int(round(2 * np.pi * args.radius / args.ds))
    theta = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    x = args.center[0] + args.radius * np.cos(theta)
    y = args.center[1] + args.radius * np.sin(theta)
    with open(args.path, "w") as fh:
        fh.write(f"{n}\n")
        for xi, yi in zip(x, y):
            fh.write(f"{xi:10.8e}\t{yi:10.8e}\n")
    print(f"wrote {n} points to {args.path}")


if __name__ == "__main__":
    main()
