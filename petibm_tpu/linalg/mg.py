"""Geometric multigrid for the pressure Poisson system.

Replaces the reference's GAMG / AmgX algebraic multigrid
(reference: examples' poisson_solver.info `-pc_type gamg`;
linsolveramgx.cpp).  The reference needs AMG because PETSc treats the
matrix as unstructured; here the mesh is owned by the framework, so
*geometric* MG on the cell-centered pressure grid is the idiomatic and
faster choice (SURVEY.md §7).

Operator hierarchy: the finest operator is the (negated) D*B1*G
finite-volume Laplacian — face coefficient area/dist, zero flux at
non-periodic domain boundaries (the a0=0 folding of normal-velocity
increments), wraparound where periodic.  Coarser levels rediscretize the
same FV formula on 2x-aggregated cell widths (pairwise sums; odd tails
keep a lone cell).  Restriction is the conservative child-sum (residuals
are integrated fluxes); prolongation is piecewise-constant injection (its
transpose).  Smoother: alternating-direction damped line-Jacobi —
batched tridiagonal solves per direction (robust on stretched /
anisotropic grids), via fused Pallas sweep kernels on TPU
(pallas_sweep.py), in-VMEM PCR (pallas_pcr.py), or LAPACK-backed
tridiagonal_solve on CPU.

Used as a V-cycle preconditioner inside CG (MGCG), keeping the outer
Krylov semantics (tolerances, iteration counts) identical to the
reference's `-ksp_type cg -pc_type gamg` configuration.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _axslice(arr, axis: int, start: int, size: int):
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(start, start + size)
    return arr[tuple(idx)]


@dataclasses.dataclass
class _Level:
    shape: tuple  # (z, y, x) ordering
    # Separable operator factors, per direction d (x, y[, z]):
    #   c1d[d]: (n_d+1,) scaled face coefficients (scale/dist); entry k
    #           couples cells k-1 and k; 0 at non-periodic walls, the wrap
    #           coefficient at entries 0 and n for periodic directions
    #   w1d[d]: (n_d,) cell widths (the perpendicular-area factors)
    # The dense DIA coefficient of a direction-d face is
    # c1d[d] x prod_{d' != d} w1d[d'].  Keeping the factors 1D and forming
    # products lazily lets XLA fuse the broadcasts into the stencil loops,
    # so applies and smoother sweeps stream only phi and out from HBM
    # instead of 2*dim+2 dense coefficient arrays (a ~3x traffic cut on
    # 3D grids; the dense arrays are materialized only once, at Pallas
    # DIA-kernel setup, via coeff()/diag_full()).
    c1d: list
    w1d: list
    periodic: list  # static per-direction wrap flags

    def _bshape(self, d: int, n: int) -> list:
        s = [1] * len(self.shape)
        s[len(self.shape) - 1 - d] = n
        return s

    def area(self, d: int):
        """Perpendicular area: broadcastable product of the other
        directions' cell widths (constant along direction d)."""
        out = None
        for dp, w in enumerate(self.w1d):
            if dp == d:
                continue
            t = w.reshape(self._bshape(dp, w.shape[0]))
            out = t if out is None else out * t
        if out is None:  # 1D operator
            out = jnp.ones((1,) * len(self.shape), self.c1d[0].dtype)
        return out

    def coeff(self, d: int):
        """Dense-value face coefficient array (the pre-refactor
        ``face_coeff[d]``), formed on demand."""
        c = self.c1d[d].reshape(self._bshape(d, self.c1d[d].shape[0]))
        return c * self.area(d)

    def diag_full(self):
        """Row diagonal (positive sum of face coefficients), broadcast to
        the level shape."""
        out = None
        for d, c in enumerate(self.c1d):
            a = (c[:-1] + c[1:]).reshape(self._bshape(d, c.shape[0] - 1))
            t = a * self.area(d)
            out = t if out is None else out + t
        return jnp.broadcast_to(out, self.shape)


class PoissonMG:
    """V-cycle preconditioner for the negated pressure Poisson operator."""

    def __init__(self, dxp: list[np.ndarray], periodic: list[bool],
                 dtype=jnp.float32, scale: float = 1.0, pre: int = 2,
                 post: int = 2, omega: float = 1.0, coarse_sweeps: int = 10,
                 min_size: int = 3, consolidate_below: int = 4096):
        """``dxp``: pressure cell widths per direction (x, y[, z]);
        ``scale``: dt factor of B1 (kept for operator parity; CG is
        invariant to preconditioner scaling); ``consolidate_below``: under
        sharding (see :meth:`set_mesh`), levels with at most this many
        cells run fully replicated (redundant coarse solve) instead of
        sharded — the distributed-MG coarse-level fix (a 6x6 level sharded
        over 8 devices is pure halo-exchange latency; the reference
        delegates the same problem to AmgX's rank consolidation,
        linsolveramgx.cpp:54-126)."""
        self.dim = len(dxp)
        self.dtype = dtype
        self.pre, self.post = pre, post
        self.omega = omega
        self.coarse_sweeps = coarse_sweeps
        self.consolidate_below = int(consolidate_below)
        self.sharding_mesh = None  # set_mesh() activates consolidation
        # line-smoother tridiagonal backend: PCR's log2(n) vectorized
        # passes are ~17x faster than the sequential Thomas recurrence on
        # TPU, while CPU's LAPACK-backed lax solver wins on host runs
        import jax

        self.use_pcr = jax.default_backend() != "cpu"
        self._pallas_interpret = jax.default_backend() != "tpu"

        # finest-level 1D data: cell widths and face inverse-distances
        widths = [np.asarray(d, np.float64) for d in dxp]
        inv_dist = []
        for d, w in enumerate(widths):
            c = np.zeros(len(w) + 1)
            c[1:-1] = 1.0 / (0.5 * (w[:-1] + w[1:]))
            if periodic[d]:
                c[0] = c[-1] = 1.0 / (0.5 * (w[0] + w[-1]))
            inv_dist.append(c)

        # Galerkin (RAP) hierarchy with child-sum restriction and injection
        # prolongation: for this separable FV operator RAP stays separable —
        # coarse interface coefficient = *fine* 1/dist at the interface face
        # times the *coarse* perpendicular area (internal fine couplings
        # cancel in the RAP diagonal).
        self.levels: list[_Level] = []
        while True:
            self.levels.append(self._make_level(widths, inv_dist, periodic, scale))
            if min(len(w) for w in widths) <= min_size or len(self.levels) > 12:
                break
            new_w, new_c = [], []
            for w, c in zip(widths, inv_dist):
                n = len(w)
                nc = (n + 1) // 2
                wc = np.zeros(nc)
                wc[: n // 2] = w[0:2 * (n // 2):2] + w[1:2 * (n // 2):2]
                if n % 2:
                    wc[-1] = w[-1]
                cc = c[np.minimum(2 * np.arange(nc + 1), n)]
                new_w.append(wc)
                new_c.append(cc)
            widths, inv_dist = new_w, new_c

    def _make_level(self, widths, inv_dist, periodic, scale) -> _Level:
        return _Level(
            shape=tuple(reversed([len(w) for w in widths])),
            c1d=[jnp.asarray(scale * c, self.dtype) for c in inv_dist],
            w1d=[jnp.asarray(w, self.dtype) for w in widths],
            periodic=list(periodic))

    # ------------------------------------------------------------------
    def _coupling(self, lvl: int, phi, d: int):
        """Direction-d off-diagonal action: sum of face-coeff * neighbor
        (positive sign), including the periodic wrap.  The 1D face factors
        multiply the shifted phi; the (constant-along-d) perpendicular
        area scales the whole term once at the end, so XLA streams no
        dense coefficient arrays."""
        level = self.levels[lvl]
        axis = self.dim - 1 - d
        n = phi.shape[axis]
        c = level.c1d[d].reshape(level._bshape(d, n + 1))
        lo = _axslice(phi, axis, 0, n - 1)
        hi = _axslice(phi, axis, 1, n - 1)
        cin = _axslice(c, axis, 1, n - 1)
        # interior faces couple (k-1, k): row k gets c(k)*phi(k-1),
        # row k-1 gets c(k)*phi(k)
        pad = [(0, 0)] * phi.ndim
        pad[axis] = (1, 0)
        out = jnp.pad(cin * lo, pad)
        pad[axis] = (0, 1)
        out = out + jnp.pad(cin * hi, pad)
        if level.periodic[d]:
            c0 = _axslice(c, axis, 0, 1)
            first = _axslice(phi, axis, 0, 1)
            last = _axslice(phi, axis, n - 1, 1)
            pad_lo = [(0, 0)] * phi.ndim
            pad_lo[axis] = (0, n - 1)
            pad_hi = [(0, 0)] * phi.ndim
            pad_hi[axis] = (n - 1, 0)
            out = out + jnp.pad(c0 * last, pad_lo) + jnp.pad(c0 * first, pad_hi)
        return level.area(d) * out

    def set_fused_apply(self, fn) -> None:
        """Route the finest-level operator through a fused (Pallas) kernel
        — used for the V-cycle's level-0 residual, the hottest apply after
        the CG operator itself."""
        self._fused_apply0 = fn

    def apply_op(self, lvl: int, phi):
        """The negated FV Laplacian at one level: positive semidefinite."""
        if lvl == 0 and getattr(self, "_fused_apply0", None) is not None:
            return self._fused_apply0(phi)
        out = self.levels[lvl].diag_full() * phi
        for d in range(self.dim):
            out = out - self._coupling(lvl, phi, d)
        return out

    def smooth(self, lvl: int, phi, rhs, sweeps: int):
        """Alternating-direction damped line-Jacobi: one sweep solves the
        tridiagonal line systems of each direction in turn (batched
        parallel cyclic reduction — log2(n) vectorized passes, see
        linalg/tridiag.py), which keeps MG robust on stretched/anisotropic
        grids where point smoothers fail (the SURVEY.md §7 'hard parts'
        anisotropy risk; the reference leans on GAMG/AmgX aggregation for
        the same reason)."""
        for _ in range(sweeps):
            for d in range(self.dim):
                phi = self._line_sweep(lvl, phi, rhs, d)
        return phi

    def _line_sweep(self, lvl: int, phi, rhs, d: int):
        from .tridiag import tridiag_solve_pcr

        level = self.levels[lvl]
        axis = self.dim - 1 - d
        n = phi.shape[axis]

        if (self.use_pcr and not any(level.periodic)
                and getattr(self, "fused_sweeps", True)
                and (self._pallas_interpret
                     or jnp.dtype(phi.dtype).itemsize <= 4)):
            # fully-fused sweep: coupling build + rescaled PCR + damped
            # update in ONE kernel — phi and rhs are the only dense HBM
            # reads, the updated phi the only write (pallas_sweep.py)
            from .pallas_sweep import (fused_sweep, fused_sweep_blocked,
                                       pick_sweep_block, sweep_aux,
                                       sweep_fits_vmem)

            def aux_for(key_lvl, key_d):
                cache = getattr(self, "_sweep_aux_cache", None)
                if cache is None:
                    cache = self._sweep_aux_cache = {}
                if (key_lvl, key_d) not in cache:
                    cache[(key_lvl, key_d)] = sweep_aux(
                        self.levels[key_lvl], key_d, self.dtype)
                return cache[(key_lvl, key_d)]

            if sweep_fits_vmem(phi.shape, phi.dtype):
                return fused_sweep(phi, rhs, aux_for(lvl, d),
                                   line_axis=axis, omega=self.omega,
                                   interpret=self._pallas_interpret)
            pb = pick_sweep_block(phi.shape, axis, phi.dtype)
            if pb is not None:
                # batch gridded into blocks; the block axis' coupling is
                # folded into the RHS by one fused XLA streaming pass
                ba, bs = pb
                b1 = rhs + self._coupling(lvl, phi, self.dim - 1 - ba)
                return fused_sweep_blocked(
                    phi, b1, aux_for(lvl, d), line_axis=axis,
                    block_axis=ba, bs=bs, omega=self.omega,
                    interpret=self._pallas_interpret)
        # off-line couplings (other directions + this direction's wrap) to RHS
        b = rhs
        for dp in range(self.dim):
            if dp != d:
                b = b + self._coupling(lvl, phi, dp)
        area = level.area(d)
        c = level.c1d[d].reshape(level._bshape(d, n + 1))
        if level.periodic[d]:
            c0 = _axslice(c, axis, 0, 1)
            first = _axslice(phi, axis, 0, 1)
            last = _axslice(phi, axis, n - 1, 1)
            pad_lo = [(0, 0)] * phi.ndim
            pad_lo[axis] = (0, n - 1)
            pad_hi = [(0, 0)] * phi.ndim
            pad_hi[axis] = (n - 1, 0)
            b = b + area * (jnp.pad(c0 * last, pad_lo)
                            + jnp.pad(c0 * first, pad_hi))

        # tridiagonal system along axis: diag = full diagonal, off = -c_in
        cin = _axslice(c, axis, 1, n - 1)
        pad = [(0, 0)] * phi.ndim
        pad[axis] = (1, 0)
        dl = -jnp.pad(cin, pad) * area  # dl[k] couples to k-1
        pad[axis] = (0, 1)
        du = -jnp.pad(cin, pad) * area  # du[k] couples to k+1
        diag = level.diag_full()
        dl = jnp.broadcast_to(dl, phi.shape)
        du = jnp.broadcast_to(du, phi.shape)

        if self.use_pcr and (self._pallas_interpret
                             or jnp.dtype(phi.dtype).itemsize <= 4):
            # fused kernels: all PCR passes stay in VMEM, no transpose;
            # whole-array when it fits, independent-line blocks otherwise
            from .pallas_pcr import (fits_vmem, pcr_pallas,
                                     pcr_pallas_blocked, pick_block)

            if fits_vmem(phi.shape, phi.dtype):
                phi_star = pcr_pallas(dl, diag, du, b, axis=axis,
                                      interpret=self._pallas_interpret)
                return phi + self.omega * (phi_star - phi)
            pb = pick_block(phi.shape, axis, phi.dtype)
            if pb is not None:
                phi_star = pcr_pallas_blocked(
                    dl, diag, du, b, axis=axis, block_axis=pb[0], bs=pb[1],
                    interpret=self._pallas_interpret)
                return phi + self.omega * (phi_star - phi)

        # move the line axis last, batch-solve, move back
        def tolast(a):
            return jnp.moveaxis(a, axis, -1)

        if self.use_pcr or jnp.dtype(phi.dtype).itemsize < 4:
            # the pure-jnp PCR path is dtype-agnostic; the LAPACK-backed
            # CPU solver below supports only f32/f64
            x = tridiag_solve_pcr(tolast(dl), tolast(diag), tolast(du),
                                  tolast(b))
        else:
            from jax.lax.linalg import tridiagonal_solve

            x = tridiagonal_solve(tolast(dl), tolast(diag), tolast(du),
                                  tolast(b)[..., None])[..., 0]
        phi_star = jnp.moveaxis(x, -1, axis)
        return phi + self.omega * (phi_star - phi)

    def restrict(self, lvl: int, r):
        """Conservative child-sum onto level lvl+1."""
        coarse_shape = self.levels[lvl + 1].shape
        out = r
        for d in range(self.dim):
            axis = self.dim - 1 - d
            n = out.shape[axis]
            nc = coarse_shape[axis]
            pad = [(0, 0)] * out.ndim
            pad[axis] = (0, 2 * nc - n)
            padded = jnp.pad(out, pad)
            new_shape = list(padded.shape)
            new_shape[axis] = nc
            new_shape.insert(axis + 1, 2)
            out = padded.reshape(new_shape).sum(axis=axis + 1)
        return out

    def prolong(self, lvl: int, e):
        """Piecewise-constant injection onto level lvl-1."""
        fine_shape = self.levels[lvl - 1].shape
        out = e
        for d in range(self.dim):
            axis = self.dim - 1 - d
            n = fine_shape[axis]
            out = jnp.repeat(out, 2, axis=axis)
            out = _axslice(out, axis, 0, n)
        return out

    def set_mesh(self, mesh) -> None:
        """Activate sharded execution: levels above ``consolidate_below``
        cells carry ("dy","dx") sharding constraints; levels at or below
        it are constrained fully replicated, so every device redundantly
        runs the tiny coarse grids with ONE all-gather at the
        consolidation boundary instead of halo exchanges on every sweep."""
        self.sharding_mesh = mesh

    def _constrain(self, lvl: int, x):
        if self.sharding_mesh is None:
            return x
        import math

        from jax.sharding import NamedSharding, PartitionSpec as P

        if math.prod(self.levels[lvl].shape) <= self.consolidate_below:
            spec = P()  # replicate: redundant coarse compute, no comms
        else:
            from ..parallel.dist import _leaf_spec

            spec = _leaf_spec(x, self.sharding_mesh)
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.sharding_mesh, spec))

    def vcycle(self, lvl: int, rhs):
        """One V-cycle solving (apply_op) e = rhs from a zero initial guess."""
        phi = jnp.zeros(self.levels[lvl].shape, self.dtype)
        if lvl == len(self.levels) - 1:
            return self.smooth(lvl, phi, rhs, self.coarse_sweeps)
        phi = self.smooth(lvl, phi, rhs, self.pre)
        r = rhs - self.apply_op(lvl, phi)
        ec = self.vcycle(lvl + 1, self._constrain(lvl + 1,
                                                  self.restrict(lvl, r)))
        phi = phi + self._constrain(lvl, self.prolong(lvl + 1, ec))
        return self.smooth(lvl, phi, rhs, self.post)

    def preconditioner(self, remove_mean: bool = True):
        """M(r) ~ A^-1 r via one V-cycle (for CG on the negated operator).

        ``remove_mean`` keeps the Krylov space orthogonal to the all-Neumann
        operator's constant nullspace: smoothers and the coarse solve inject
        an arbitrary constant which otherwise accumulates through the CG
        recurrences and (in f32) can stall convergence.  Disable for the
        pinned-pressure (nonsingular) variant.
        """
        if not remove_mean:
            return lambda r: self.vcycle(0, r)

        def M(r):
            out = self.vcycle(0, r - jnp.mean(r))
            return out - jnp.mean(out)

        return M
