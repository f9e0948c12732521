"""Flow solvers: projection-method Navier-Stokes and IBM variants."""

from .navierstokes import NavierStokesSolver  # noqa: F401
from .decoupledibpm import DecoupledIBPMSolver  # noqa: F401
from .ibpm import IBPMSolver  # noqa: F401
from .rigidkinematics import RigidKinematicsSolver  # noqa: F401
