"""Prescribed-kinematics moving-body solver CLI.

The reference ships RigidKinematicsSolver as a header-only extension point
(users write a main; applications/rigidkinematics/).  The built-in
``kinematics:`` config node makes the common prescribed motions runnable
directly; custom motion = subclass RigidKinematicsSolver in user code.
"""

from __future__ import annotations

import sys

from ..solvers.rigidkinematics import RigidKinematicsSolver
from .common import config_from_args, make_parser, maybe_profile


def main(argv=None) -> int:
    args = make_parser(
        "TPU-native decoupled IBPM with prescribed body kinematics").parse_args(argv)
    config = config_from_args(args)
    solver = RigidKinematicsSolver(config)
    print(solver.mesh.info())
    print(f"bodies: {solver.bodies.n_bodies} ({solver.bodies.n_pts} points)")
    solver.run(progress=True)
    maybe_profile(solver, args)
    solver.close()
    print(solver.timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
