"""Pallas TPU kernels for the hot stencil operations.

The pressure Poisson operator is the framework's hottest op (applied every
CG iteration and at the finest multigrid level).  As an assembled matrix it
is a 5/7-point banded system; the TPU-native sparse format is DIA (one
dense value array per diagonal offset) — loads are fully contiguous and the
kernel runs at VPU/HBM speed, unlike CSR whose gathers TPU serializes
(BASELINE.md "Poisson SpMV at speed-of-light nnz/s").

Kernels (all non-periodic; boundary zero-flux is baked into the
coefficient arrays as zero entries):

- ``poisson_apply_2d``: whole-array 5-point apply, everything resident in
  VMEM — one fused kernel instead of ~15 XLA slice ops per CG iteration.
- ``poisson_apply_2d_tiled``: row-slab grid for 2D arrays too large for
  VMEM; phi stays in HBM and each grid step DMAs a halo'd row slab into a
  double-buffered VMEM scratch (next slab's fetch overlaps this block's
  compute) while the coefficient blocks stream through the normal Pallas
  pipeline.
- ``poisson_apply_3d`` / ``poisson_apply_3d_tiled``: the 7-point variants;
  large 3D grids (e.g. the 160x130x130 sphere case) don't fit VMEM whole,
  so the tiled form grids over z-slabs.

``make_pallas_poisson`` picks the kernel for a PoissonMG hierarchy's
finest level (or returns None when no kernel applies: periodic wrap, f64
on real TPU, or no viable slab split).  Measured on TPU v5e
(scripts/bench_spmv.py): the whole-array kernel edges out the XLA slice
formulation; the slab-tiled kernels run at ~0.75x XLA, whose fused stencil
loop streams each operand exactly once with hardware prefetch — so tiling
is opt-in (``tiled=True`` / ``parameters.pallasTiled``) and
larger-than-VMEM operators default to the XLA path.
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
# whole-array kernels (operands resident in VMEM)
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


def _inplane_terms_2d(phi, diag, w, e, s, n):
    """5-point combination where the y-neighbor planes are taken from the
    same array (used per z-plane by the 3D kernels)."""
    ny, nx = phi.shape[-2:]
    zrow = jnp.zeros(phi.shape[:-2] + (1, nx), phi.dtype)
    zcol = jnp.zeros(phi.shape[:-2] + (ny, 1), phi.dtype)
    phi_w = jnp.concatenate([zcol, phi[..., :, :-1]], axis=-1)
    phi_e = jnp.concatenate([phi[..., :, 1:], zcol], axis=-1)
    phi_s = jnp.concatenate([zrow, phi[..., :-1, :]], axis=-2)
    phi_n = jnp.concatenate([phi[..., 1:, :], zrow], axis=-2)
    return diag * phi - w * phi_w - e * phi_e - s * phi_s - n * phi_n


def _kernel_3d(phi_ref, diag_ref, w_ref, e_ref, s_ref, n_ref, d_ref, u_ref,
               out_ref):
    phi = phi_ref[:]
    nz = phi.shape[0]
    zpl = jnp.zeros((1,) + phi.shape[1:], phi.dtype)
    phi_d = jnp.concatenate([zpl, phi[:-1]], axis=0)
    phi_u = jnp.concatenate([phi[1:], zpl], axis=0)
    out_ref[:] = (_inplane_terms_2d(phi, diag_ref[:], w_ref[:], e_ref[:],
                                    s_ref[:], n_ref[:])
                  - d_ref[:] * phi_d - u_ref[:] * phi_u)


@functools.partial(jax.jit, static_argnames=("interpret",))
def poisson_apply_3d(phi, diag, west, east, south, north, down, up,
                     interpret=False):
    """One fused 7-point DIA apply, whole array in VMEM (small 3D grids)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _kernel_3d,
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(phi, diag, west, east, south, north, down, up)


# ----------------------------------------------------------------------
# slab-tiled kernels: phi stays in HBM, each grid step DMAs a halo'd slab
# DMA slab halo (rows/planes on each side of a block).  Mosaic requires
# DMA slices of tiled HBM memrefs to be 8-aligned in the sublane dim, so
# the halo is a full 8-row tile and blocks are multiples of 8: slab size
# bs+16 and slab offsets {0, 8, 16} are then all tile-aligned.
_HALO = 8


def _slab_dma(pl, pltpu, phi_hbm, slab_ref, sem, bs: int, axis_len: int,
              blk, slot):
    """The async copy bringing block ``blk``'s halo'd slab into slot
    ``slot`` of the double-buffered scratch.

    The copy is always ``bs + 2h`` rows from a clamped source start, but
    the *destination* offset shifts so that global row ``blk*bs`` always
    lands at slab row ``2h``: dst = 2h - (blk*bs - start), i.e. h for
    interior blocks, 2h for the first, 0 for the last.  Compute can then
    use purely static slab slices (Mosaic only lowers static vector slice
    offsets) with no per-block select."""
    h = _HALO
    start = jnp.clip(blk * bs - h, 0, axis_len - (bs + 2 * h))
    # bs, axis_len and h are all multiples of the 8-row tile, so start and
    # dst are too; Mosaic's divisibility prover needs the explicit hint
    start = pl.multiple_of(start, h)
    dst = pl.multiple_of(2 * h - (blk * bs - start), h)
    return pltpu.make_async_copy(
        phi_hbm.at[pl.ds(start, bs + 2 * h)],
        slab_ref.at[slot, pl.ds(dst, bs + 2 * h)], sem.at[slot])


def _slab_parts(pl, pltpu, phi_hbm, slab_ref, sem, bs: int, axis_len: int,
                nblk: int):
    """Return (lo, mid, hi) slab views for grid step i: mid = the block's
    own rows/planes at the fixed slab offset 2h, lo/hi its -1/+1 neighbor
    rows — all static slices (see _slab_dma).

    The slab DMA is double-buffered across grid steps: step i kicks off
    block i+1's copy before waiting on its own, so the HBM fetch of the
    next slab overlaps this block's compute (grid steps run sequentially
    on the core).

    Domain-edge neighbor rows (row 2h-1 for the first block, row 2h+bs for
    the last) lie outside that block's copy; their products are zeroed by
    the zero DIA boundary coefficients, so stale-but-finite data is
    harmless.  The only hazard is *uninitialized* scratch (NaN * 0 = NaN)
    on a slot's first use, which the i == 0 zeroing below covers.
    """
    h = _HALO
    i = pl.program_id(0)
    slot = i % 2
    nxt = (i + 1) % 2

    def dma(blk, slot):
        return _slab_dma(pl, pltpu, phi_hbm, slab_ref, sem, bs, axis_len,
                         blk, slot)

    @pl.when(i == 0)
    def _():
        # slot 0 first use: the first block's copy spans [2h, bs+4h) and
        # its lo slice reads row 2h-1 — zero it before use.  When the last
        # block is slot 1's FIRST use (nblk == 2), its hi slice reads row
        # 2h+bs, outside its [0, bs+2h) copy — zero that too (no race:
        # blk 1's in-flight copy never touches that row in this case).
        slab_ref[0, 2 * h - 1] = jnp.zeros_like(slab_ref[0, 2 * h - 1])
        if nblk == 2:
            slab_ref[1, 2 * h + bs] = jnp.zeros_like(slab_ref[1, 2 * h + bs])
        dma(i, slot).start()

    @pl.when(i + 1 < nblk)
    def _():
        dma(i + 1, nxt).start()

    dma(i, slot).wait()
    slab = slab_ref[slot]
    mid = slab[2 * h:2 * h + bs]
    lo = slab[2 * h - 1:2 * h - 1 + bs]
    hi = slab[2 * h + 1:2 * h + 1 + bs]
    return lo, mid, hi


def _make_kernel_2d_tiled(bs: int, ny: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(phi_hbm, diag_ref, w_ref, e_ref, s_ref, n_ref, out_ref,
               slab_ref, sem):
        south, phi, north = _slab_parts(pl, pltpu, phi_hbm, slab_ref, sem,
                                        bs, ny, ny // bs)
        nx = phi.shape[-1]
        zcol = jnp.zeros((bs, 1), phi.dtype)
        phi_w = jnp.concatenate([zcol, phi[:, :-1]], axis=1)
        phi_e = jnp.concatenate([phi[:, 1:], zcol], axis=1)
        out_ref[:] = (diag_ref[:] * phi - w_ref[:] * phi_w
                      - e_ref[:] * phi_e - s_ref[:] * south
                      - n_ref[:] * north)

    return kernel


def _make_kernel_3d_tiled(bs: int, nz: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(phi_hbm, diag_ref, w_ref, e_ref, s_ref, n_ref, d_ref, u_ref,
               out_ref, slab_ref, sem):
        down, phi, upv = _slab_parts(pl, pltpu, phi_hbm, slab_ref, sem,
                                     bs, nz, nz // bs)
        out_ref[:] = (_inplane_terms_2d(phi, diag_ref[:], w_ref[:], e_ref[:],
                                        s_ref[:], n_ref[:])
                      - d_ref[:] * down - u_ref[:] * upv)

    return kernel


def _tiled_call(kernel, phi, coeffs, bs: int, interpret: bool):
    """Common pallas_call wiring for the slab-tiled kernels: phi unblocked
    in compiler-chosen (HBM) space, coefficients and output in leading-axis
    blocks, double-buffered slab scratch + DMA semaphore pair."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n0 = phi.shape[0]
    rest = phi.shape[1:]
    nblk = n0 // bs
    blockspec = pl.BlockSpec((bs,) + rest, lambda i: (i,) + (0,) * len(rest),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [blockspec] * len(coeffs),
        out_specs=blockspec,
        scratch_shapes=[pltpu.VMEM((2, bs + 4 * _HALO) + rest, phi.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(phi, *coeffs)


@functools.partial(jax.jit, static_argnames=("bs", "interpret"))
def poisson_apply_2d_tiled(phi, diag, west, east, south, north, bs,
                           interpret=False):
    return _tiled_call(_make_kernel_2d_tiled(bs, phi.shape[0]), phi,
                       (diag, west, east, south, north), bs, interpret)


@functools.partial(jax.jit, static_argnames=("bs", "interpret"))
def poisson_apply_3d_tiled(phi, diag, west, east, south, north, down, up, bs,
                           interpret=False):
    return _tiled_call(_make_kernel_3d_tiled(bs, phi.shape[0]), phi,
                       (diag, west, east, south, north, down, up), bs,
                       interpret)


# ----------------------------------------------------------------------
# DIA coefficient extraction from a PoissonMG level
def _broadcast_pair(level, d: int, shape):
    """(lo, hi) dense coefficient arrays for direction d: the face arrays
    sliced to cells, domain-edge entries zeroed for non-periodic walls."""
    dim = len(shape)
    axis = dim - 1 - d
    c = level.coeff(d)
    sl_lo = [slice(None)] * c.ndim
    sl_lo[axis] = slice(0, -1)
    sl_hi = [slice(None)] * c.ndim
    sl_hi[axis] = slice(1, None)
    lo = jnp.broadcast_to(c[tuple(sl_lo)], shape)
    hi = jnp.broadcast_to(c[tuple(sl_hi)], shape)
    if not level.periodic[d]:
        idx0 = [slice(None)] * dim
        idx0[axis] = 0
        idx1 = [slice(None)] * dim
        idx1[axis] = shape[axis] - 1
        lo = lo.at[tuple(idx0)].set(0.0)
        hi = hi.at[tuple(idx1)].set(0.0)
    return lo, hi


def dia_coefficients(level):
    """Dense per-point DIA coefficient arrays from a PoissonMG level:
    (diag, w, e, s, n[, down, up]) in (z, y, x) layout."""
    shape = level.shape
    dim = len(shape)
    out = [level.diag_full()]
    for d in range(dim):  # x, y[, z] -> (w,e), (s,n)[, (down,up)]
        out.extend(_broadcast_pair(level, d, shape))
    return tuple(out)


def dia_coefficients_2d(mg_level):
    """Back-compat wrapper returning (diag, west, east, south, north)."""
    return dia_coefficients(mg_level)


# ----------------------------------------------------------------------
# separable-coefficient kernels: the FV operator's dense coefficients are
# products of 1D factors (linalg/mg.py _Level), so instead of streaming
# 2*dim+1 dense DIA arrays the kernel rebuilds every coefficient
# in-register from O(n) vectors.  HBM traffic: read phi, write out — the
# 2-array mandatory minimum (the DIA kernels above stream pts+2 arrays;
# the fused XLA formulation measures well short of roofline on large 3D).


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


def _make_sep_kernel_tiled_3d(bs: int):
    """z-blocked kernel without halos: the z term (whose coupling crosses
    block boundaries) arrives precomputed from one fused XLA streaming
    pass; the kernel fuses the in-plane (x, y) terms and the final sum.
    A halo'd slab DMA would save the extra pass, but Mosaic rejects HBM
    slices whose sublane/lane extents aren't tile-aligned (e.g. ny = 130
    on the sphere grid), and real meshes are rarely 8/128-aligned."""

    def kernel(*refs):
        phi = refs[0][:]
        zterm = refs[1][:]
        aux = [r[:] for r in refs[2:10]]
        out_ref = refs[-1]
        out_ref[:] = zterm + _sep_terms(phi, aux, 3, {1, 2})

    return kernel


@functools.partial(jax.jit, static_argnames=("bs", "interpret"))
def poisson_apply_separable_tiled_3d(phi, aux, bs, interpret=False):
    """Blocked separable apply for 3D levels too large for VMEM: XLA
    computes the z term (read phi, write zterm), the kernel the rest
    (~5 dense-array HBM round trips total).  Partial edge blocks are
    fine (masked writes; garbage never crosses rows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..linalg.pallas_pcr import _shift

    nz = phi.shape[0]
    # z direction is d = 2 -> aux[8:12]
    a_z, c_lo_z, c_hi_z, area_z = (jnp.asarray(a, phi.dtype)
                                   for a in aux[8:12])
    zterm = area_z * (a_z * phi - c_lo_z * _shift(phi, 1, -3, 0.0)
                      - c_hi_z * _shift(phi, -1, -3, 0.0))

    def spec_for(arr):
        shape = tuple(bs if ax == 0 and arr.shape[0] > 1 else arr.shape[ax]
                      for ax in range(3))

        def index_map(i, s=arr.shape):
            return (i if s[0] > 1 else 0, 0, 0)

        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    from ..linalg.pallas_pcr import _params

    operands = [phi, zterm] + [jnp.asarray(a) for a in aux[:8]]
    return pl.pallas_call(
        _make_sep_kernel_tiled_3d(bs),
        grid=(-(-nz // bs),),
        out_shape=jax.ShapeDtypeStruct(phi.shape, phi.dtype),
        in_specs=[spec_for(a) for a in operands],
        out_specs=spec_for(phi),
        compiler_params=_params(pltpu),
        interpret=interpret,
    )(*operands)


def _pick_sep_block(nz: int, plane_bytes: int,
                    budget: int = _VMEM_BUDGET) -> int | None:
    """Block size for the z-blocked separable apply: live set ~ phi,
    zterm, out blocks (double-buffered by the pipeline) + ~4 temporaries;
    any bs works (partial edge blocks allowed, axis 0 is untiled).
    Capped at 16 planes — many small pipelined blocks overlap better, and
    large blocks balloon the kernel's scoped-VMEM stack (bs=79 on the
    sphere grid hit a 110 MB stack and failed to compile; bs=12 runs)."""
    bs = min(nz // 2, max(1, budget // max(10 * plane_bytes, 1)), 16)
    if bs < 1 or -(-nz // bs) < 2:
        return None
    return bs


def _pick_block(n0: int, per_row_bytes: int, ncoeffs: int) -> int | None:
    """Largest 8-multiple divisor bs of n0 with 2+ blocks, a full slab
    (bs + 2*_HALO <= n0), and the kernel's actual VMEM working set within
    the budget; None if none works.

    The working set mirrors _tiled_call's allocations: the 2-slot slab
    scratch of (bs + 4h) rows each, plus the Pallas pipeline's
    double-buffered blocks for the ncoeffs coefficient inputs and the
    output (2 x (ncoeffs + 1) x bs rows)."""
    best = None
    for bs in range(_HALO, n0 // 2 + 1, _HALO):
        if n0 % bs or bs + 2 * _HALO > n0:
            continue
        work = (2 * (bs + 4 * _HALO)
                + 2 * (ncoeffs + 1) * bs) * per_row_bytes
        if work <= _VMEM_BUDGET:
            best = bs
    return best


def make_pallas_poisson(mg, interpret: bool | None = None,
                        tiled: bool = False):
    """A fused finest-level Poisson apply for a non-periodic PoissonMG
    hierarchy (2D or 3D); returns None when no kernel applies (periodic
    wrap, f64 on real TPU, larger than VMEM with ``tiled=False``, or no
    viable slab split)."""
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

    # preferred: separable kernels — phi + out are the only dense streams.
    # Whole-array is capped at ~24 MB live set: beyond that the kernel's
    # full-size temporaries (shifted copies) and lane-padded broadcast
    # operands (a (nz, ny, 1) factor pads to 128 lanes in VMEM) blow the
    # scoped-VMEM stack (measured: 1024^2 compiles at an 18 MB stack, the
    # sphere grid OOMs), and measured XLA is at parity there anyway.
    sep = separable_aux(level)
    if 5 * ncells * itemsize <= min(budget, 24 * 1024 * 1024):

        def apply_sep(phi):
            return poisson_apply_separable(phi, sep, interpret=interpret)

        apply_sep.traffic_arrays = 2  # phi + out only (separable factors)
        return apply_sep
    if dim == 3 and tiled:
        # opt-in like the 2D slab DIA kernel: measured on v5e the XLA
        # streaming stencil beats the z-blocked kernel at sphere scale
        # (0.144 vs 0.215 ms/apply), so larger-than-VMEM 3D defaults to
        # XLA; scripts/bench_spmv.py records the comparison
        bs = _pick_sep_block(level.shape[0],
                             math.prod(level.shape[1:]) * itemsize,
                             budget=budget)
        if bs is not None:

            def apply_sep_t(phi):
                return poisson_apply_separable_tiled_3d(
                    phi, sep, bs=bs, interpret=interpret)

            apply_sep_t.traffic_arrays = 2
            return apply_sep_t

    # legacy DIA fallbacks (streamed dense coefficient arrays)
    coeffs = dia_coefficients(level)
    narrs = 2 + len(coeffs)  # phi + out + coefficients
    total = narrs * ncells * itemsize

    if total <= _VMEM_BUDGET:
        apply_full = poisson_apply_2d if dim == 2 else poisson_apply_3d

        def apply_fn(phi):
            return apply_full(phi, *coeffs, interpret=interpret)

        apply_fn.traffic_arrays = narrs  # DIA: streams dense coefficients
        return apply_fn

    if not tiled:
        return None  # XLA's fused stencil is faster for streaming sizes
    n0 = level.shape[0]
    per_row = math.prod(level.shape[1:]) * itemsize
    bs = _pick_block(n0, per_row, len(coeffs))
    if bs is None:
        return None
    apply_tiled = (poisson_apply_2d_tiled if dim == 2
                   else poisson_apply_3d_tiled)

    def apply_fn(phi):
        return apply_tiled(phi, *coeffs, bs=bs, interpret=interpret)

    apply_fn.traffic_arrays = narrs  # DIA: streams dense coefficients
    return apply_fn
