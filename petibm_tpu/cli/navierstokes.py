"""petibm-navierstokes equivalent
(reference: applications/navierstokes/main.cpp:45-78)."""

from __future__ import annotations

import sys

from ..solvers.navierstokes import NavierStokesSolver
from .common import config_from_args, make_parser


def main(argv=None) -> int:
    args = make_parser("TPU-native Navier-Stokes projection solver").parse_args(argv)
    config = config_from_args(args)
    solver = NavierStokesSolver(config)
    print(solver.mesh.info())
    solver.io_initial_data()
    while not solver.finished():
        solver.advance()
        solver.write()
        if solver.ite % max(1, solver.nsave // 1) == 0 or solver.finished():
            print(f"[time step {solver.ite}] t = {solver.t:.6g}")
    solver.close()
    print(solver.timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
