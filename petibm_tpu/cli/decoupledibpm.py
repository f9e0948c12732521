"""petibm-decoupledibpm equivalent
(reference: applications/decoupledibpm/main.cpp)."""

from __future__ import annotations

import sys

from ..solvers.decoupledibpm import DecoupledIBPMSolver
from .common import config_from_args, make_parser, maybe_profile


def main(argv=None) -> int:
    args = make_parser(
        "TPU-native decoupled IBPM solver (Li et al. 2016)").parse_args(argv)
    config = config_from_args(args)
    solver = DecoupledIBPMSolver(config)
    print(solver.mesh.info())
    print(f"bodies: {solver.bodies.n_bodies} ({solver.bodies.n_pts} points)")
    solver.run(progress=True)
    maybe_profile(solver, args)
    solver.close()
    print(solver.timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
