"""Fully-fused multigrid line-smoother sweep as one Pallas TPU kernel.

One alternating-direction line-Jacobi sweep (PoissonMG._line_sweep) in the
unfused formulation costs ~10 dense-array HBM round trips: build the line
RHS from the other directions' couplings (read phi, write b), solve the
batched tridiagonal systems (read dl/diag/du/b, write x), then apply the
damped update (read phi, x, write out).  This kernel does the whole sweep
with exactly three dense-array transfers — read phi, read rhs, write the
updated phi — by exploiting the operator's separable structure
(linalg/mg.py _Level: every dense coefficient is a product of 1D factors).

Key identity: scaling each line's tridiagonal system by the perpendicular
area A_d = prod_{e != d} w_e (constant along the line) makes the
sub/super-diagonals *pure 1D* vectors shared by every line in the batch:

    a'[i] = -c_d[i],   c'[i] = -c_d[i+1],
    b'[batch, i] = a_d[i] + w_d[i] * sum_{e != d} (a_e / w_e)[batch],
    rhs'[batch, i] = rhs / A_d + sum_{e != d} (w_d[i] / w_e) * couple_e(phi),

with a_e = c_e[:-1] + c_e[1:] the per-direction diagonal sums, so every
dense coefficient is rebuilt in-register from O(n) vectors instead of
being streamed from HBM.  The tridiagonal solve is the in-VMEM
parallel cyclic reduction of linalg/pallas_pcr.py; the damped update
phi + omega*(x - phi) happens before the single output write.

Non-periodic directions only (a periodic wrap makes the line system
cyclic; PoissonMG falls back to the unfused path there).  Reference
provenance: this fuses the smoother of the pressure-Poisson solve that
the reference delegates to generic AMG (linsolverksp.cpp -pc_type gamg /
linsolveramgx.cpp); the structured-grid line relaxation is the TPU-native
replacement, not a port.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_pcr import _params, _shift


def _pcr(a, b, c, d, n: int, axis: int):
    """In-register PCR passes (same math as pallas_pcr._make_kernel)."""
    steps = max(1, math.ceil(math.log2(n)))
    k = 1
    for _ in range(steps):
        alpha = -a / _shift(b, k, axis, 1.0)
        beta = -c / _shift(b, -k, axis, 1.0)
        a, b, c, d = (
            alpha * _shift(a, k, axis, 0.0),
            b + alpha * _shift(c, k, axis, 0.0)
            + beta * _shift(a, -k, axis, 0.0),
            beta * _shift(c, -k, axis, 0.0),
            d + alpha * _shift(d, k, axis, 0.0)
            + beta * _shift(d, -k, axis, 0.0),
        )
        k *= 2
    return d / b


def sweep_aux(level, d: int, dtype):
    """The kernel's small broadcast-shaped operands for a line sweep along
    direction ``d`` of a PoissonMG ``_Level`` (non-periodic).

    Returns ``[a_lo, c_hi, diag_line, w_line, inv_area, s_batch]
    + [c_lo_e, c_hi_e, ratio_e for each other direction e]`` where every
    entry broadcasts against the level shape:

    - ``a_lo``/``c_hi``: the shared sub/super-diagonals -c_d[i] / -c_d[i+1]
    - ``diag_line``: a_d = c_d[:-1] + c_d[1:]
    - ``w_line``: the line direction's cell widths
    - ``inv_area``: 1 / prod_{e != d} w_e  (batch-shaped)
    - ``s_batch``: sum_{e != d} a_e / w_e  (batch-shaped)
    - per other direction e: the coupling factors c_e[:-1], c_e[1:] and the
      area ratio 1 / w_e (the w_d[i] numerator rides on ``w_line``)
    """
    ndim = len(level.shape)

    # All math in host numpy: this runs lazily from inside jit traces
    # (PoissonMG caches the result), and any jnp op issued while a trace
    # is active would join that trace and leak tracers into the cache.
    def bcast(vec, direction):
        a = np.asarray(vec, np.float64)
        return a.reshape(level._bshape(direction, len(a)))

    c_d = np.asarray(level.c1d[d], np.float64)  # (n+1,) face coefficients
    # wall entries of c1d are zero for non-periodic directions, so
    # a_lo[0] = c_hi[-1] = 0 as the PCR convention requires
    a_lo = bcast(-c_d[:-1], d)
    c_hi = bcast(-c_d[1:], d)
    diag_line = bcast(c_d[:-1] + c_d[1:], d)
    w_line = bcast(level.w1d[d], d)

    inv_area = None
    s_batch = None
    extras = []
    for e in range(ndim):
        if e == d:
            continue
        w_e = np.asarray(level.w1d[e], np.float64)
        c_e = np.asarray(level.c1d[e], np.float64)
        inv_w = bcast(1.0 / w_e, e)
        inv_area = inv_w if inv_area is None else inv_area * inv_w
        a_e = bcast((c_e[:-1] + c_e[1:]) / w_e, e)
        s_batch = a_e if s_batch is None else s_batch + a_e
        # couple_e(phi)[k] = c_e[k] * phi[k-1] + c_e[k+1] * phi[k+1];
        # wall entries of c1d are already zero for non-periodic directions
        extras += [bcast(c_e[:-1], e), bcast(c_e[1:], e), inv_w]
    npdt = np.dtype(dtype)
    return [np.ascontiguousarray(a.astype(npdt)) for a in
            [a_lo, c_hi, diag_line, w_line, inv_area, s_batch] + extras]


def _make_sweep_kernel(ndim: int, line_axis: int, other_axes: tuple,
                       n_line: int, omega: float):
    """Kernel: operands (phi, rhs, a_lo, c_hi, diag_line, w_line, inv_area,
    s_batch, [c_lo_e, c_hi_e, inv_w_e]*, out)."""
    neg_line_axis = line_axis - ndim

    def kernel(*refs):
        phi = refs[0][:]
        rhs = refs[1][:]
        a_lo, c_hi, diag_line, w_line, inv_area, s_batch = (
            r[:] for r in refs[2:8])
        out_ref = refs[-1]

        b = rhs * inv_area
        for j, e_axis in enumerate(other_axes):
            c_lo = refs[8 + 3 * j][:]
            c_hi_e = refs[9 + 3 * j][:]
            inv_w = refs[10 + 3 * j][:]
            neg_e = e_axis - ndim
            couple = (c_lo * _shift(phi, 1, neg_e, 0.0)
                      + c_hi_e * _shift(phi, -1, neg_e, 0.0))
            b = b + (w_line * inv_w) * couple
        diag = diag_line + w_line * s_batch
        x = _pcr(jnp.broadcast_to(a_lo, phi.shape), diag,
                 jnp.broadcast_to(c_hi, phi.shape), b, n_line, neg_line_axis)
        out_ref[:] = phi + omega * (x - phi)

    return kernel


@functools.partial(jax.jit, static_argnames=("line_axis", "omega",
                                             "interpret"))
def fused_sweep(phi, rhs, aux, line_axis: int, omega: float,
                interpret: bool = False):
    """One damped line-Jacobi sweep along ``line_axis`` fused into a single
    whole-array kernel; ``aux`` from :func:`sweep_aux`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndim = phi.ndim
    line_axis = line_axis % ndim
    # sweep_aux emits per-direction extras in ascending direction order,
    # i.e. DESCENDING array axes (axis = ndim - 1 - direction)
    other_axes = tuple(ax for ax in reversed(range(ndim))
                       if ax != line_axis)
    kernel = _make_sweep_kernel(ndim, line_axis, other_axes,
                                phi.shape[line_axis], omega)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(aux)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=_params(pltpu),
        interpret=interpret,
    )(phi, rhs, *aux)


def sweep_fits_vmem(shape, dtype, budget: int | None = None) -> bool:
    """Live set ~ phi, rhs, b, diag + PCR's a, b, c, d and shifted
    temporaries — same order as the plain PCR kernel plus two.  Capped at
    the largest live set verified on hardware (see pallas_pcr)."""
    from .pallas_pcr import _WHOLE_ARRAY_CAP, device_vmem_budget

    if budget is None:
        budget = device_vmem_budget()
    budget = min(budget, _WHOLE_ARRAY_CAP)
    return 10 * math.prod(shape) * jnp.dtype(dtype).itemsize <= budget


# ----------------------------------------------------------------------
# blocked variant for levels too large for one VMEM-resident kernel
# (the 3D finest levels).  The batch is gridded along one non-line axis;
# that axis' coupling needs neighbor values across block boundaries, so
# the caller precomputes b1 = rhs + area_ba * couple_ba(phi) in XLA (one
# fused streaming pass) and the kernel fuses the remaining coupling, the
# rescaled PCR, and the damped update.  HBM round trips: ~6 dense-array
# transfers vs ~10 unfused (phi+rhs+b1 in the XLA pass; phi+b1+out here).


def _make_blocked_kernel(ndim: int, line_axis: int, in_axes: tuple,
                         n_line: int, omega: float):
    """Kernel over one batch block: operands (phi, b1, a_lo, c_hi,
    diag_line, w_line, inv_area, s_batch, [c_lo_e, c_hi_e, inv_w_e] for
    each in-kernel coupling axis in ``in_axes``, out)."""

    def kernel(*refs):
        phi = refs[0][:]
        b1 = refs[1][:]
        a_lo, c_hi, diag_line, w_line, inv_area, s_batch = (
            r[:] for r in refs[2:8])
        out_ref = refs[-1]

        b = b1 * inv_area
        for j, e_axis in enumerate(in_axes):
            c_lo = refs[8 + 3 * j][:]
            c_hi_e = refs[9 + 3 * j][:]
            inv_w = refs[10 + 3 * j][:]
            neg_e = e_axis - ndim
            couple = (c_lo * _shift(phi, 1, neg_e, 0.0)
                      + c_hi_e * _shift(phi, -1, neg_e, 0.0))
            b = b + (w_line * inv_w) * couple
        diag = diag_line + w_line * s_batch
        x = _pcr(jnp.broadcast_to(a_lo, phi.shape), diag,
                 jnp.broadcast_to(c_hi, phi.shape), b, n_line,
                 line_axis - ndim)
        out_ref[:] = phi + omega * (x - phi)

    return kernel


@functools.partial(jax.jit, static_argnames=("line_axis", "block_axis",
                                             "bs", "omega", "interpret"))
def fused_sweep_blocked(phi, b1, aux, line_axis: int, block_axis: int,
                        bs: int, omega: float, interpret: bool = False):
    """Blocked fused sweep: ``b1`` must already contain rhs plus the
    *block axis'* area-weighted coupling (PoissonMG._coupling); ``aux``
    from :func:`sweep_aux` — the block axis' coupling triple is ignored.

    Partial edge blocks are allowed (grid = ceil(n/bs)): out-of-bounds
    lanes/rows hold unspecified values, but every tridiagonal line lies
    entirely inside or outside the valid region, so garbage never crosses
    into stored results (out-of-bounds writes are masked)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndim = phi.ndim
    line_axis = line_axis % ndim
    block_axis = block_axis % ndim
    assert block_axis != line_axis
    # aux order (see fused_sweep): descending array axes excluding line
    other_axes = tuple(ax for ax in reversed(range(ndim))
                       if ax != line_axis)
    head, extras = aux[:6], aux[6:]
    in_axes, in_extras = [], []
    for j, e_axis in enumerate(other_axes):
        if e_axis != block_axis:
            in_axes.append(e_axis)
            in_extras += extras[3 * j:3 * j + 3]
    operands = [phi, b1] + head + in_extras
    nblk = -(-phi.shape[block_axis] // bs)  # ceil

    def spec_for(arr):
        shape = tuple(bs if ax == block_axis and arr.shape[ax] > 1
                      else arr.shape[ax] for ax in range(ndim))

        def index_map(i, shape_=arr.shape):
            return tuple(i if ax == block_axis and shape_[ax] > 1 else 0
                         for ax in range(ndim))

        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    kernel = _make_blocked_kernel(ndim, line_axis, tuple(in_axes),
                                  phi.shape[line_axis], omega)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        in_specs=[spec_for(a) for a in operands],
        out_specs=spec_for(phi),
        compiler_params=_params(pltpu),
        interpret=interpret,
    )(*operands)


def pick_sweep_block(shape, line_axis: int, dtype,
                     budget: int | None = None):
    """(block_axis, bs) for :func:`fused_sweep_blocked`, or None.

    Blocks along axis 0 when it is not the line axis (untiled for 3D
    arrays — no alignment constraints), else axis 1.  bs sizes the
    kernel's live set (~19 block-sized arrays, a deliberately pessimistic
    model) into the budget, then caps at the alignment granule or 8 —
    measured on v5e, many small pipelined blocks beat fewer large ones
    (sphere grid: bs=8 at 0.76 ms vs bs=16 at 0.84 ms for the z sweep)."""
    from .pallas_pcr import device_vmem_budget

    if budget is None:
        budget = device_vmem_budget()
    ndim = len(shape)
    line_axis = line_axis % ndim
    block_axis = 0 if line_axis != 0 else 1
    # Mosaic block-shape alignment: untiled leading axes (3D axis 0) block
    # freely; the sublane axis needs 8-multiples, the lane axis
    # 128-multiples (partial *edge* blocks are fine either way)
    gran = (1 if block_axis < ndim - 2
            else (8 if block_axis == ndim - 2 else 128))
    per = (19 * math.prod(shape) * jnp.dtype(dtype).itemsize
           // shape[block_axis])
    bs = min(shape[block_axis] // 2, max(1, budget // max(per, 1)),
             max(gran, 8))
    bs = (bs // gran) * gran
    if bs < gran or -(-shape[block_axis] // bs) < 2:
        return None
    return block_axis, bs
