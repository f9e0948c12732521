"""Fused Pallas PCR: all log2(n) cyclic-reduction passes in VMEM.

The XLA formulation of parallel cyclic reduction (linalg/tridiag.py)
materializes ~8 array-sized intermediates per pass in HBM — at 450^2 that
is ~58 MB of traffic per line solve, and the multigrid smoother's line
solves dominate the whole time step.  This kernel keeps a, b, c, d
resident in VMEM across every pass (4 x n^2 x 4 B ~ 3.2 MB at 450^2), so
HBM sees exactly one read of the four inputs and one write of the result.

Shifts are static per pass (k = 1, 2, 4, ...) along either the lane
(axis -1) or sublane (axis -2) dimension, lowered by Mosaic as in-register
rotates.  Out-of-range neighbor diagonals read as 1 and off-diagonals as 0
(same convention as tridiag.py), via static fill-block concatenation.

Used by PoissonMG for 2D levels that fit VMEM; everything else falls back
to the XLA PCR.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _shift(x, k: int, axis: int, fill: float):
    """x shifted by +k along ``axis`` (value at i <- old value at i-k),
    vacated entries = fill; k may be negative."""
    if k == 0:
        return x
    n = x.shape[axis]
    blk_shape = list(x.shape)
    blk_shape[axis] = abs(k)
    blk = jnp.full(blk_shape, fill, x.dtype)
    idx = [slice(None)] * x.ndim
    if k > 0:
        idx[axis] = slice(0, n - k)
        return jnp.concatenate([blk, x[tuple(idx)]], axis=axis)
    idx[axis] = slice(-k, n)
    return jnp.concatenate([x[tuple(idx)], blk], axis=axis)


def _make_kernel(n: int, axis: int):
    steps = max(1, math.ceil(math.log2(n)))

    def kernel(a_ref, b_ref, c_ref, d_ref, out_ref):
        a, b, c, d = a_ref[:], b_ref[:], c_ref[:], d_ref[:]
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
        out_ref[:] = d / b

    return kernel


@functools.partial(jax.jit, static_argnames=("axis", "interpret"))
def pcr_pallas(a, b, c, d, axis: int, interpret: bool = False):
    """Solve the batched tridiagonal systems along ``axis``.  a[first] /
    c[last] along the axis must be zero (PoissonMG's line systems satisfy
    this by construction).  The whole arrays must fit VMEM
    (:func:`fits_vmem`); larger batches go through
    :func:`pcr_pallas_blocked`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    axis = axis % a.ndim
    kernel = _make_kernel(a.shape[axis], axis - a.ndim)  # negative axis
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=_params(pltpu),
        interpret=interpret,
    )(a, b, c, d)


def _params(pltpu):
    # Mosaic's default 16 MB scoped-VMEM cap is tighter than the kernel's
    # live set (4 operands + shifted temporaries + pipeline buffers);
    # raise it — pick_block sizes blocks so the true usage stays well
    # under the chip's VMEM
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("axis", "block_axis", "bs",
                                             "interpret"))
def pcr_pallas_blocked(a, b, c, d, axis: int, block_axis: int, bs: int,
                       interpret: bool = False):
    """PCR with the batch gridded into blocks along ``block_axis`` (any
    axis other than the line axis; bs must divide its extent).  Lines are
    independent, so blocks need no halos — plain BlockSpec pipelining."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ndim = a.ndim
    axis = axis % ndim
    block_axis = block_axis % ndim
    assert block_axis != axis
    assert a.shape[block_axis] % bs == 0
    blk = tuple(bs if ax == block_axis else s for ax, s in enumerate(a.shape))
    spec = pl.BlockSpec(
        blk, lambda i: tuple(i if ax == block_axis else 0
                             for ax in range(ndim)),
        memory_space=pltpu.VMEM)
    kernel = _make_kernel(a.shape[axis], axis - ndim)
    return pl.pallas_call(
        kernel,
        grid=(a.shape[block_axis] // bs,),
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[spec] * 4,
        out_specs=spec,
        compiler_params=_params(pltpu),
        interpret=interpret,
    )(a, b, c, d)


_DEFAULT_BUDGET = 8 * 1024 * 1024
_V5_BUDGET = 64 * 1024 * 1024


def device_vmem_budget(fallback: int = _DEFAULT_BUDGET) -> int:
    """VMEM working-set budget for kernel sizing.  The conservative 8 MB
    default suits older TPU generations; v5e/v5p/v6e expose 112-128 MB of
    VMEM per core (empirically: 25 MB-live kernels compile and run on
    v5 lite), so whole-array kernels remain profitable far longer."""
    try:
        dev = jax.devices()[0]
        kind = str(getattr(dev, "device_kind", "")).lower()
        if dev.platform == "tpu" and any(
                k in kind for k in ("v5 lite", "v5e", "v5p", "v6")):
            return max(fallback, _V5_BUDGET)
    except Exception:  # pragma: no cover
        pass
    return fallback


# largest whole-array live set empirically verified to compile and run on
# v5e (~25 MB); the separable apply uses the same cap (pallas_stencil.py).
# device_vmem_budget() can model up to 64 MB on v5e+, but admitting a
# never-measured 64 MB live set risks a Mosaic scoped-VMEM failure at
# runtime on mid-size grids, so whole-array admission stays at this cap
# until larger live sets are actually measured on hardware.
_WHOLE_ARRAY_CAP = 24 * 1024 * 1024


def fits_vmem(shape, dtype, budget: int | None = None) -> bool:
    """Whether a whole-array PCR (4 inputs + out + temporaries) fits."""
    if budget is None:
        budget = device_vmem_budget()
    budget = min(budget, _WHOLE_ARRAY_CAP)
    return 8 * math.prod(shape) * jnp.dtype(dtype).itemsize <= budget


def pick_block(shape, axis: int, dtype,
               budget: int | None = None) -> tuple[int, int] | None:
    """(block_axis, bs) gridding a too-large batch into VMEM-sized blocks.

    Prefers a non-lane block axis (blocking the minor-most dim below 128
    lanes wastes tile padding); among those, the largest extent.  bs is the
    largest divisor whose block fits the budget.  None if no split works.
    """
    if budget is None:
        budget = device_vmem_budget()
    ndim = len(shape)
    axis = axis % ndim
    # Pallas TPU blocks must keep the trailing two dims divisible by the
    # (8, 128) tile; leading (untiled) axes block freely — try those first
    order = [ax for ax in range(ndim - 2) if ax != axis]
    order += [ax for ax in (ndim - 2, ndim - 1) if ax >= 0 and ax != axis]
    for block_axis in order:
        gran = 1 if block_axis < ndim - 2 else (8 if block_axis == ndim - 2
                                                else 128)
        n0 = shape[block_axis]
        per = (8 * math.prod(shape) * jnp.dtype(dtype).itemsize) // n0
        best = None
        for bs in range(gran, n0, gran):
            if n0 % bs == 0 and bs * per <= budget:
                best = bs
        if best:
            return (block_axis, best)
    return None
