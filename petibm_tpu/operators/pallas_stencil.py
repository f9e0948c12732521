"""Pallas TPU kernels for the hot stencil operations.

The pressure Poisson operator is the framework's hottest op (applied every
CG iteration and MG level).  As an assembled matrix it is a 5/7-point
banded system; the TPU-native sparse format is DIA (one dense value array
per diagonal offset) — loads are fully contiguous and the kernel runs at
VPU/HBM speed, unlike CSR whose gathers TPU serializes (BASELINE.md
"Poisson SpMV at speed-of-light nnz/s").

``poisson_apply_2d`` fuses the whole 5-point apply (4 shifted
multiply-adds + diagonal) into one kernel: out = diag*phi - W*phi_w -
E*phi_e - S*phi_s - N*phi_n with zero-flux (or wrap) boundaries baked into
the coefficient arrays.  Falls back to the XLA slice formulation off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel_2d(phi_ref, diag_ref, w_ref, e_ref, s_ref, n_ref, out_ref):
    phi = phi_ref[:]
    ny, nx = phi.shape
    zrow = jnp.zeros((1, nx), phi.dtype)
    zcol = jnp.zeros((ny, 1), phi.dtype)
    phi_w = jnp.concatenate([zcol, phi[:, :-1]], axis=1)
    phi_e = jnp.concatenate([phi[:, 1:], zcol], axis=1)
    phi_s = jnp.concatenate([zrow, phi[:-1, :]], axis=0)
    phi_n = jnp.concatenate([phi[1:, :], zrow], axis=0)
    out_ref[:] = (diag_ref[:] * phi - w_ref[:] * phi_w - e_ref[:] * phi_e
                  - s_ref[:] * phi_s - n_ref[:] * phi_n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def poisson_apply_2d(phi, diag, west, east, south, north, interpret=False):
    """One fused 5-point DIA apply (non-periodic; boundary coefficients are
    zero in the W/E/S/N arrays)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _kernel_2d,
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phi, diag, west, east, south, north)


def dia_coefficients_2d(mg_level):
    """Dense per-point W/E/S/N coefficient arrays from a PoissonMG level
    (the DIA form of the level's FV matrix)."""
    ny, nx = mg_level.shape
    cx = mg_level.face_coeff[0]  # (ny, nx+1)
    cy = mg_level.face_coeff[1]  # (ny+1, nx)
    west = jnp.broadcast_to(cx[:, :-1], (ny, nx))
    east = jnp.broadcast_to(cx[:, 1:], (ny, nx))
    south = jnp.broadcast_to(cy[:-1, :], (ny, nx))
    north = jnp.broadcast_to(cy[1:, :], (ny, nx))
    if not mg_level.periodic[0]:
        west = west.at[:, 0].set(0.0)
        east = east.at[:, -1].set(0.0)
    if not mg_level.periodic[1]:
        south = south.at[0, :].set(0.0)
        north = north.at[-1, :].set(0.0)
    diag = jnp.broadcast_to(mg_level.diag, (ny, nx))
    return diag, west, east, south, north


def make_pallas_poisson(mg, interpret: bool | None = None):
    """A fused finest-level Poisson apply for a 2D non-periodic PoissonMG
    hierarchy; returns None when the kernel does not apply (3D, periodic,
    or VMEM won't fit)."""
    level = mg.levels[0]
    if len(level.shape) != 2 or any(level.periodic):
        return None
    if _on_tpu() and jnp.dtype(mg.dtype).itemsize > 4:
        return None  # TPU has no f64; the X64→X32 rewrite can't cross a custom call
    ny, nx = level.shape
    itemsize = jnp.dtype(mg.dtype).itemsize
    if 7 * ny * nx * itemsize > 12 * 1024 * 1024:  # phi+5 coeffs+out in VMEM
        return None
    if interpret is None:
        interpret = not _on_tpu()
    diag, west, east, south, north = dia_coefficients_2d(level)

    def apply_fn(phi):
        return poisson_apply_2d(phi, diag, west, east, south, north,
                                interpret=interpret)

    return apply_fn
