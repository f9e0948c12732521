"""Immersed-boundary layer: regularized delta kernels, Lagrangian bodies,
and the interpolation/spreading (E/H) operators."""

from .delta import KERNELS, peskin_2002, roma_1999  # noqa: F401
from .body import BodyPack, SingleBody, read_lagrangian_points  # noqa: F401
from .interp import DeltaOp  # noqa: F401
