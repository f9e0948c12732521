"""petibm-navierstokes equivalent
(reference: applications/navierstokes/main.cpp:45-78)."""

from __future__ import annotations

import sys

from ..solvers.navierstokes import NavierStokesSolver
from .common import config_from_args, make_parser, maybe_profile


def main(argv=None) -> int:
    args = make_parser("TPU-native Navier-Stokes projection solver").parse_args(argv)
    config = config_from_args(args)
    solver = NavierStokesSolver(config)
    print(solver.mesh.info())
    solver.run(progress=True)
    maybe_profile(solver, args)
    solver.close()
    print(solver.timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
