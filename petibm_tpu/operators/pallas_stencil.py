"""Pallas TPU kernels for the hot stencil operations.

The pressure Poisson operator is the framework's hottest op (applied every
CG/refinement iteration of the fast-diagonalization pressure solve and at
the finest multigrid level).  The separable structure (linalg/mg.py
_Level.c1d/w1d) means the only mandatory HBM traffic of an apply is
read-phi + write-out: coefficients are 1D/broadcast factors.

Two kernels are carried — the ones that win:

- ``poisson_apply_separable``: whole-array 5/7-point apply with broadcast
  factor operands, everything resident in VMEM.  Measured 0.85-1.5x XLA
  across sessions (par within relay noise; these small applies are
  dispatch-bound — scripts/bench_spmv.py).
- ``make_zblocked_helmholtz`` / ``make_pallas_momentum``: z-blocked
  streaming 7-point apply for the 3D implicit momentum operator — 1.76x
  the extend-based XLA form at 256^3 (1.79 vs 3.15 ms; XLA's 3D stencils
  run 7-12x off the 2-array roofline in every formulation tried —
  round-5 A/B in validation/perf_spmv.jsonl).

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


# ----------------------------------------------------------------------
# z-blocked streaming 7-point apply (3D momentum Helmholtz operator)
#
# XLA's fused 3D stencil measures ~12x the 2-array roofline at 256^3
# (1.82 ms for the one-field Poisson form; 3.15 ms for the 3-component
# extend-based momentum apply) — the pad/shift chains relayout the
# minor-most tiles instead of streaming.  This kernel pipelines z-blocks
# of the full (ny, nx) plane through VMEM with two halo PLANES per block
# (traffic = (1 + 2/bz) reads + 1 write per cell), does the y/x neighbor
# shifts in-register (static concats, wrap included), and encodes every
# wall/ghost fold in per-axis 1D coefficient vectors:
#
#   out = f * (Dz + Dy + Dx) + CNz*f[k-1] + CPz*f[k+1]
#                            + CNy*f[j-1] + ... + CPx*f[i+1]
#
# with CN*[0] = CP*[n-1] = 0 at non-periodic walls (the a0 ghost fold
# lives in D*) and periodic z wrap via modular halo-plane index maps.


def _hh_kernel(periodic_y, periodic_x, bz: int = 0, nz: int = 0,
               scaled: bool = False):
    """``bz``/``nz`` nonzero => the grid doesn't tile nz: zero the padded
    z rows after load (their content is undefined — possibly NaN, and
    0 * NaN would poison the last valid row's neighbor term).
    ``scaled``: three extra 1D refs (Sz, Sy, Sx) multiply the result —
    the rank-1 perpendicular-area factor of the conservative Poisson
    operator (A = prod(w) * sum_d T_d / w_d)."""
    def kernel(*refs):
        from jax.experimental import pallas as pl

        (flo_ref, f_ref, fhi_ref, dz_ref, cnz_ref, cpz_ref,
         dy_ref, cny_ref, cpy_ref, dx_ref, cnx_ref, cpx_ref) = refs[:12]
        out_ref = refs[-1]
        f = f_ref[:]
        if bz:
            gz = (pl.program_id(0) * bz
                  + jax.lax.broadcasted_iota(jnp.int32, (bz, 1, 1), 0))
            f = jnp.where(gz < nz, f, 0.0)
        lo_z = jnp.concatenate([flo_ref[:], f[:-1]], axis=0)
        hi_z = jnp.concatenate([f[1:], fhi_ref[:]], axis=0)
        if periodic_y:
            lo_y = jnp.concatenate([f[:, -1:, :], f[:, :-1, :]], axis=1)
            hi_y = jnp.concatenate([f[:, 1:, :], f[:, :1, :]], axis=1)
        else:
            zy = jnp.zeros_like(f[:, :1, :])
            lo_y = jnp.concatenate([zy, f[:, :-1, :]], axis=1)
            hi_y = jnp.concatenate([f[:, 1:, :], zy], axis=1)
        if periodic_x:
            lo_x = jnp.concatenate([f[:, :, -1:], f[:, :, :-1]], axis=2)
            hi_x = jnp.concatenate([f[:, :, 1:], f[:, :, :1]], axis=2)
        else:
            zx = jnp.zeros_like(f[:, :, :1])
            lo_x = jnp.concatenate([zx, f[:, :, :-1]], axis=2)
            hi_x = jnp.concatenate([f[:, :, 1:], zx], axis=2)
        out = (f * (dz_ref[:] + dy_ref[:] + dx_ref[:])
               + cnz_ref[:] * lo_z + cpz_ref[:] * hi_z
               + cny_ref[:] * lo_y + cpy_ref[:] * hi_y
               + cnx_ref[:] * lo_x + cpx_ref[:] * hi_x)
        if scaled:
            sz_ref, sy_ref, sx_ref = refs[12:15]
            out = out * (sz_ref[:] * sy_ref[:] * sx_ref[:])
        out_ref[:] = out

    return kernel


def make_zblocked_helmholtz(shape, vecs, periodic, dtype,
                            interpret=False, bz: int = 8,
                            scale_vecs=None):
    """Compile the z-blocked 7-point apply for one velocity component.

    ``shape`` = (nz, ny, nx); ``vecs`` = dict with per-axis 1D numpy
    vectors D/CN/CP (keys 'Dz','CNz','CPz','Dy',...,'CPx') already
    carrying every wall fold; ``periodic`` = (pz, py, px).  Returns
    ``apply(f) -> out`` or None when the shape doesn't admit the kernel.
    """
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..linalg.pallas_pcr import _params

    nz, ny, nx = shape
    pz, py, px = periodic
    if pz:
        # periodic z wrap uses modular halo-plane maps: the grid must
        # tile nz exactly (a padded last block would wrap garbage)
        while bz > 1 and nz % bz:
            bz //= 2
        if nz % bz:
            return None
    # non-periodic z: Pallas masks the padded last block's stores, the
    # halo maps clamp, and CPz[nz-1] = 0 kills the one garbage neighbor
    nblk = -(-nz // bz)
    if bz < 2 or nblk < 2:
        return None

    def as3(vec, axis):
        s = [1, 1, 1]
        s[axis] = len(vec)
        return jnp.asarray(np.asarray(vec).reshape(s), dtype)

    dz, cnz, cpz = (as3(vecs[k], 0) for k in ("Dz", "CNz", "CPz"))
    dy, cny, cpy = (as3(vecs[k], 1) for k in ("Dy", "CNy", "CPy"))
    dx, cnx, cpx = (as3(vecs[k], 2) for k in ("Dx", "CNx", "CPx"))

    if pz:
        lo_map = lambda i: ((i * bz - 1) % nz, 0, 0)
        hi_map = lambda i: ((i * bz + bz) % nz, 0, 0)
    else:
        # clamped halo planes: CNz[0] = CPz[nz-1] = 0 kills the garbage
        lo_map = lambda i: (jnp.maximum(i * bz - 1, 0), 0, 0)
        hi_map = lambda i: (jnp.minimum(i * bz + bz, nz - 1), 0, 0)

    plane = pl.BlockSpec((1, ny, nx), lo_map)
    plane_hi = pl.BlockSpec((1, ny, nx), hi_map)
    blk = pl.BlockSpec((bz, ny, nx), lambda i: (i, 0, 0))
    zvec = pl.BlockSpec((bz, 1, 1), lambda i: (i, 0, 0))
    yvec = pl.BlockSpec((1, ny, 1), lambda i: (0, 0, 0))
    xvec = pl.BlockSpec((1, 1, nx), lambda i: (0, 0, 0))

    scaled = scale_vecs is not None
    in_specs = [plane, blk, plane_hi, zvec, zvec, zvec,
                yvec, yvec, yvec, xvec, xvec, xvec]
    extra = ()
    if scaled:
        extra = (as3(scale_vecs[0], 0), as3(scale_vecs[1], 1),
                 as3(scale_vecs[2], 2))
        in_specs += [zvec, yvec, xvec]
    call = pl.pallas_call(
        _hh_kernel(py, px, bz=(bz if nz % bz else 0), nz=nz,
                   scaled=scaled),
        grid=(nblk,),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), dtype),
        in_specs=in_specs,
        out_specs=blk,
        compiler_params=_params(pltpu),
        interpret=interpret,
    )

    def apply(f):
        return call(f, f, f, dz, cnz, cpz, dy, cny, cpy, dx, cnx, cpx,
                    *extra)

    apply.traffic_arrays = 2
    return apply


def make_pallas_momentum(mesh, bcset, dt: float, cnu: float, dtype,
                         interpret: bool | None = None):
    """Fused z-blocked apply of the implicit momentum operator
    A u = u/dt - cnu * L u for every velocity component (3D only).

    Returns a dict->dict closure matching NavierStokesSolver.A_momentum,
    or None when the kernel doesn't apply (2D, f64-on-TPU, tiny nz, or
    oversized planes).  Wall a0 folds and periodic wraps reproduce
    operators/stencil.make_laplacian's homogeneous action exactly
    (tests/test_pallas.py asserts equality)."""
    import numpy as np

    from ..mesh import StaggeredMesh  # noqa: F401  (typing only)
    from ..types import Field

    if mesh.dim != 3:
        return None
    if _on_tpu() and jnp.dtype(dtype).itemsize > 4:
        return None
    if interpret is None:
        interpret = not _on_tpu()
    from ..linalg.pallas_pcr import device_vmem_budget

    budget = device_vmem_budget(_VMEM_BUDGET)
    from .stencil import VEL_NAMES

    applies = {}
    for c in range(mesh.dim):
        shape = mesh.shape(Field(c))
        nz, ny, nx = shape
        bz = 8
        # ~10 block-sized live temporaries (shifted concats) per block
        while bz > 1 and bz * ny * nx * 4 * 10 > budget:
            bz //= 2
        vecs = {}
        for d in range(3):
            axis = 2 - d  # direction d -> array axis
            tag = ("x", "y", "z")[d]
            line = mesh.lines[Field(c)][d]
            cn = 1.0 / (np.asarray(line.dneg()) * np.asarray(line.interior_dl))
            cp = 1.0 / (np.asarray(line.dpos()) * np.asarray(line.interior_dl))
            fold = np.zeros_like(cn)
            CN, CP = cn.copy(), cp.copy()
            if not mesh.periodic[d]:
                fold[0] = bcset.specs[(c, 2 * d + 0)].a0 * cn[0]
                fold[-1] += bcset.specs[(c, 2 * d + 1)].a0 * cp[-1]
                CN[0] = 0.0
                CP[-1] = 0.0
            ldiag = -(cn + cp) + fold
            key = {"x": ("Dx", "CNx", "CPx"), "y": ("Dy", "CNy", "CPy"),
                   "z": ("Dz", "CNz", "CPz")}[tag]
            vecs[key[0]] = -cnu * ldiag
            vecs[key[1]] = -cnu * CN
            vecs[key[2]] = -cnu * CP
        vecs["Dz"] = vecs["Dz"] + 1.0 / dt
        per = (bool(mesh.periodic[2]), bool(mesh.periodic[1]),
               bool(mesh.periodic[0]))  # (pz, py, px)
        apply_c = make_zblocked_helmholtz(shape, vecs, per, dtype,
                                          interpret=interpret, bz=bz)
        if apply_c is None:
            return None
        applies[VEL_NAMES[c]] = apply_c

    def A_momentum(u):
        return {name: applies[name](u[name]) for name in applies}

    A_momentum.traffic_arrays = 2
    return A_momentum


def make_pallas_poisson_zblocked(mg, interpret: bool | None = None):
    """z-blocked streaming apply of the 3D conservative Poisson operator
    (PoissonMG level 0 / -D B1 G), for the grids the whole-array kernel
    declines.  A = prod(w) * sum_d T_d / w_d keeps every coefficient a
    per-axis 1D vector: D_d = (c_d[:-1]+c_d[1:])/w_d, CN_d = -c_d[:-1]/w_d,
    CP_d = -c_d[1:]/w_d, with the rank-1 scale (w_z, w_y, w_x) applied
    in-kernel.  Periodic wrap rides the same c-vector entries
    (line_operator's wrap coefficient) + modular halo maps."""
    import numpy as np

    level = mg.levels[0]
    if len(level.shape) != 3:
        return None
    if _on_tpu() and jnp.dtype(mg.dtype).itemsize > 4:
        return None
    if interpret is None:
        interpret = not _on_tpu()

    vecs = {}
    scale = [None, None, None]
    for d in range(3):
        axis = 2 - d
        c = np.asarray(level.c1d[d], np.float64)
        w = np.asarray(level.w1d[d], np.float64)
        tag = ("x", "y", "z")[d]
        key = {"x": ("Dx", "CNx", "CPx"), "y": ("Dy", "CNy", "CPy"),
               "z": ("Dz", "CNz", "CPz")}[tag]
        vecs[key[0]] = (c[:-1] + c[1:]) / w
        vecs[key[1]] = -c[:-1] / w
        vecs[key[2]] = -c[1:] / w
        scale[axis] = w
    per = (bool(level.periodic[2]), bool(level.periodic[1]),
           bool(level.periodic[0]))
    apply_z = make_zblocked_helmholtz(
        tuple(level.shape), vecs, per, mg.dtype, interpret=interpret,
        scale_vecs=tuple(scale))
    if apply_z is None:
        return None
    # periodic wrap coefficients: CN[0]/CP[n-1] are NONZERO for periodic
    # axes (the wrap), which is exactly what the kernel's roll/modular
    # paths consume; non-periodic axes have c[0] = c[n] = 0 already.
    apply_z.traffic_arrays = 2
    return apply_z


# ----------------------------------------------------------------------
# z-blocked divergence-form convection N(u) (3D)
#
# The XLA closure (operators/convection.py) extends each component once
# and forms the 2-point averages as slice arithmetic; at 256^3 the
# 27-window chain runs several streaming passes.  Here the extended
# arrays (ghosts filled by BoundarySet.extend, still XLA) feed one
# z-blocked kernel per output component: block + two trailing halo
# planes per input, all 9 flux terms formed in VMEM, traffic ~ 3 reads
# + 1 write per cell.


def _conv_kernel(dim_offsets, bz):
    """dim_offsets: static list of (ext_index, slice-start offsets) term
    structure captured by the caller closure; here we just assemble."""
    def kernel(*refs):
        # refs: for each of 3 ext arrays: block, plane1, plane2; then
        # inv-dl vecs (z, y, x); then out
        stacks = []
        for e in range(3):
            blk, p1, p2 = refs[3 * e], refs[3 * e + 1], refs[3 * e + 2]
            stacks.append(jnp.concatenate([blk[:], p1[:], p2[:]], axis=0))
        ivz, ivy, ivx = refs[9][:], refs[10][:], refs[11][:]
        out_ref = refs[-1]

        def win(e, offs, shape):
            st = stacks[e]
            idx = tuple(slice(1 + offs.get(ax, 0),
                              1 + offs.get(ax, 0) + shape[ax])
                        for ax in range(3))
            return st[idx]

        out_ref[:] = dim_offsets(win, (out_ref.shape[0],
                                       out_ref.shape[1],
                                       out_ref.shape[2]),
                                 (ivz, ivy, ivx))

    return kernel


def make_pallas_convection(mesh, bcset, dtype, interpret: bool | None = None,
                           bz: int = 8):
    """Fused 3D convection: returns ``conv(q, bcstate)`` matching
    operators/convection.make_convection (equality pinned by
    tests/test_pallas.py), or None when the kernel doesn't apply."""
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..linalg.pallas_pcr import _params, device_vmem_budget
    from ..types import Field
    from .stencil import VEL_NAMES

    if mesh.dim != 3:
        return None
    if _on_tpu() and jnp.dtype(dtype).itemsize > 4:
        return None
    if interpret is None:
        interpret = not _on_tpu()
    budget = device_vmem_budget(_VMEM_BUDGET)

    shapes = [mesh.shape(Field(c)) for c in range(3)]
    ext_shapes = [tuple(s + 2 for s in sh) for sh in shapes]
    maxplane = max(sh[1] * sh[2] for sh in ext_shapes)
    while bz > 2 and (bz + 2) * maxplane * 4 * 6 > budget:
        bz //= 2

    inv_dl = {c: [np.asarray(mesh.bcast(Field(c), d, 1.0 / mesh.dl(Field(c), d)),
                             np.float64)
                  for d in range(3)] for c in range(3)}

    calls = []
    for c in range(3):
        NZ, NY, NX = shapes[c]
        nblk = -(-NZ // bz)
        if nblk < 2:
            return None

        def build_terms(c=c):
            # returns f(win, shape, (ivz, ivy, ivx)) -> out block
            def terms(win, shape, ivs):
                # ivs are (bz,1,1)/(1,NY,1)/(1,1,NX) blocks of the three
                # per-direction 1/dl broadcasts for component c
                iv = {2: ivs[0], 1: ivs[1], 0: ivs[2]}  # direction d=2 is z
                total = None
                for d in range(3):
                    ax = 2 - d  # direction -> array axis
                    if d == c:
                        fW = 0.5 * (win(c, {ax: -1}, shape)
                                    + win(c, {ax: 0}, shape))
                        fE = 0.5 * (win(c, {ax: 0}, shape)
                                    + win(c, {ax: 1}, shape))
                        term = (fE * fE - fW * fW) * iv[d]
                    else:
                        cax = 2 - c
                        aM = 0.5 * (win(c, {ax: -1}, shape)
                                    + win(c, {ax: 0}, shape))
                        aP = 0.5 * (win(c, {ax: 0}, shape)
                                    + win(c, {ax: 1}, shape))
                        advM = 0.5 * (win(d, {ax: -1, cax: 0}, shape)
                                      + win(d, {ax: -1, cax: 1}, shape))
                        advP = 0.5 * (win(d, {ax: 0, cax: 0}, shape)
                                      + win(d, {ax: 0, cax: 1}, shape))
                        term = (advP * aP - advM * aM) * iv[d]
                    total = term if total is None else total + term
                return total

            return terms

        in_specs = []
        for e in range(3):
            EZ, EY, EX = ext_shapes[e]
            in_specs.append(pl.BlockSpec((bz, EY, EX), lambda i: (i, 0, 0)))
            for off in (0, 1):
                in_specs.append(pl.BlockSpec(
                    (1, EY, EX),
                    (lambda off, ez: lambda i: (
                        jnp.minimum(i * bz + bz + off, ez - 1), 0, 0))(
                            off, EZ)))
        zvec = pl.BlockSpec((bz, 1, 1), lambda i: (i, 0, 0))
        yvec = pl.BlockSpec((1, NY, 1), lambda i: (0, 0, 0))
        xvec = pl.BlockSpec((1, 1, NX), lambda i: (0, 0, 0))
        in_specs += [zvec, yvec, xvec]

        vz = jnp.asarray(inv_dl[c][2].reshape(-1, 1, 1), dtype)
        vy = jnp.asarray(inv_dl[c][1].reshape(1, -1, 1), dtype)
        vx = jnp.asarray(inv_dl[c][0].reshape(1, 1, -1), dtype)

        call = pl.pallas_call(
            _conv_kernel(build_terms(), bz),
            grid=(nblk,),
            out_shape=jax.ShapeDtypeStruct((NZ, NY, NX), dtype),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bz, NY, NX), lambda i: (i, 0, 0)),
            compiler_params=_params(pltpu),
            interpret=interpret,
        )
        calls.append((call, vz, vy, vx))

    def convection(q, bcstate):
        ext = [bcset.extend(q[VEL_NAMES[e]], e, bcstate) for e in range(3)]
        out = {}
        for c in range(3):
            call, vz, vy, vx = calls[c]
            args = []
            for e in range(3):
                args += [ext[e], ext[e], ext[e]]
            out[VEL_NAMES[c]] = call(*args, vz, vy, vx)
        return out

    return convection
