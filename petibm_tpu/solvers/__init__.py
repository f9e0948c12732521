"""Flow solvers: projection-method Navier-Stokes and IBM variants."""

from .navierstokes import NavierStokesSolver  # noqa: F401
