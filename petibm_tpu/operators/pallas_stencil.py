"""Pallas TPU kernels for the hot stencil operations.

The pressure Poisson operator is the framework's hottest op (applied every
CG/refinement iteration of the fast-diagonalization pressure solve and at
the finest multigrid level).  The separable structure (linalg/mg.py
_Level.c1d/w1d) means the only mandatory HBM traffic of an apply is
read-phi + write-out: coefficients are 1D/broadcast factors.

One kernel is carried — the one that wins:

- ``poisson_apply_separable``: whole-array 5/7-point apply with broadcast
  factor operands, everything resident in VMEM.  Measured 0.85-1.5x XLA
  across sessions (par within relay noise; these small applies are
  dispatch-bound — scripts/bench_spmv.py).

``make_pallas_poisson`` returns it for a PoissonMG hierarchy's finest
level when it fits the measured ~24 MB live-set cap, else None — XLA's
fused streaming stencil owns larger grids.  Negative results that led to
deleting the round-2/3 kernel portfolio (recorded in
validation/perf_spmv.jsonl, still reproducible from git history):

- DIA kernels (dense per-diagonal value arrays) stream pts+2 arrays where
  the separable form streams 2 — strictly worse once separable_aux
  existed; the whole-array DIA path was also unreachable (every size it
  admitted, the separable kernel admitted first).
- Slab-tiled variants (2D row slabs with double-buffered halo DMA; 3D
  z-blocks, finally with per-block halo PLANES so the z coupling needed
  no extra streaming pass): best 107 Gnnz/s on the 160x130x130 sphere
  grid vs XLA's 137.  At streaming sizes XLA also streams only phi+out
  (the broadcast factors fuse), so Pallas has no traffic to save and
  pays grid/pipeline overhead — a fundamental loss, not a tuning gap.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

# conservative VMEM working-set budget (bytes); real VMEM is ~16 MB/core
# but the pipeline double-buffers blocked inputs
_VMEM_BUDGET = 10 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


# ----------------------------------------------------------------------
def separable_aux(level):
    """Per direction d: [a_d, c_lo_d, c_hi_d, area_d] (numpy, broadcast
    shapes).  a_d = c_d[:-1]+c_d[1:]; c_lo/c_hi the face coefficients for
    the -/+ neighbor; area_d = prod_{e != d} w_e (batch-shaped).  Host
    numpy so results can be cached from inside jit traces."""
    import numpy as np

    ndim = len(level.shape)
    out = []
    for d in range(ndim):
        def bcast(vec, direction):
            a = np.asarray(vec, np.float64)
            return a.reshape(level._bshape(direction, len(a)))

        c_d = np.asarray(level.c1d[d], np.float64)
        area = None
        for e in range(ndim):
            if e == d:
                continue
            w = bcast(level.w1d[e], e)
            area = w if area is None else area * w
        npdt = np.dtype(level.c1d[d].dtype)
        out += [np.ascontiguousarray(a.astype(npdt)) for a in
                (bcast(c_d[:-1] + c_d[1:], d), bcast(c_d[:-1], d),
                 bcast(c_d[1:], d), area)]
    return out


def _sep_terms(phi, aux, ndim: int, axes):
    """sum_d area_d * (a_d*phi - c_lo_d*phi[-1 shift] - c_hi_d*phi[+1])
    over the directions whose array axes are in ``axes`` (shift helpers
    from the PCR kernel: static concat-based rolls)."""
    from ..linalg.pallas_pcr import _shift

    out = None
    for d in range(ndim):
        axis = ndim - 1 - d
        if axis not in axes:
            continue
        a_d, c_lo, c_hi, area = aux[4 * d:4 * d + 4]
        term = (a_d * phi - c_lo * _shift(phi, 1, axis - ndim, 0.0)
                - c_hi * _shift(phi, -1, axis - ndim, 0.0))
        term = area * term
        out = term if out is None else out + term
    return out


def _make_sep_kernel_full(ndim: int):
    def kernel(*refs):
        phi = refs[0][:]
        aux = [r[:] for r in refs[1:-1]]
        refs[-1][:] = _sep_terms(phi, aux, ndim, set(range(ndim)))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def poisson_apply_separable(phi, aux, interpret=False):
    """Whole-array separable apply (non-periodic)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..linalg.pallas_pcr import _params

    return pl.pallas_call(
        _make_sep_kernel_full(phi.ndim),
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(aux)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=_params(pltpu),
        interpret=interpret,
    )(phi, *aux)



def make_pallas_poisson(mg, interpret: bool | None = None):
    """The fused whole-array separable Poisson apply for a non-periodic
    PoissonMG hierarchy (2D or 3D); returns None when no kernel applies
    (periodic wrap, f64 on real TPU, or a live set beyond the ~24 MB
    verified cap — XLA's streaming stencil owns those)."""
    level = mg.levels[0]
    dim = len(level.shape)
    if dim not in (2, 3) or any(level.periodic):
        return None
    if _on_tpu() and jnp.dtype(mg.dtype).itemsize > 4:
        return None  # TPU has no f64; the X64->X32 rewrite can't cross a custom call
    if interpret is None:
        interpret = not _on_tpu()
    itemsize = jnp.dtype(mg.dtype).itemsize
    ncells = math.prod(level.shape)
    from ..linalg.pallas_pcr import device_vmem_budget

    budget = device_vmem_budget(_VMEM_BUDGET)

    # Whole-array is capped at ~24 MB live set: beyond that the kernel's
    # full-size temporaries (shifted copies) and lane-padded broadcast
    # operands (a (nz, ny, 1) factor pads to 128 lanes in VMEM) blow the
    # scoped-VMEM stack (measured: 1024^2 compiles at an 18 MB stack, the
    # sphere grid OOMs), and measured XLA is at parity there anyway.
    if 5 * ncells * itemsize > min(budget, 24 * 1024 * 1024):
        return None
    sep = separable_aux(level)

    def apply_sep(phi):
        return poisson_apply_separable(phi, sep, interpret=interpret)

    apply_sep.traffic_arrays = 2  # phi + out only (separable factors)
    return apply_sep
