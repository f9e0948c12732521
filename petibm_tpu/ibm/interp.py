"""Interpolation (E) and spreading (H) via regularized delta windows.

Reference (src/operators/createdelta.cpp:28-208 + decoupledibpm.cpp:149-216):
the delta operator is a sparse matrix with one row per (Lagrangian point,
velocity component) whose columns are the component's grid points within
±kernel half-width of the point's pressure cell, valued with the
tensor-product kernel.  E = Delta * diag(R*MHat) (volume-weighted
interpolation); H = Delta^T (spreading).

TPU-native realization: the tensor-product structure is kept *separated*
as per-direction banded factor matrices S_d of shape (nPts, n_d) — each row
holds the 1D kernel weights of one Lagrangian point scattered to its ±w
gridline window (built by one-hot comparison, no scatter op).  Then

  interpolation (2D):  E u = sum_x ( (S_y^vol @ u) * S_x^vol )
  spreading (2D):      H f = (S_y^delta * f)^T @ S_x^delta

— dense matmuls on the MXU instead of XLA gather/scatter, which TPU
serializes (measured ~100x slowdown with the scatter formulation).  The
factors are recomputed *inside jit* from the (possibly traced) body
coordinates, so prescribed-kinematics bodies re-derive their stencils every
step with static shapes and zero recompilation (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mesh import StaggeredMesh
from ..types import Field
from .delta import KERNELS

VEL_NAMES = ("u", "v", "w")


class DeltaOp:
    def __init__(self, mesh: StaggeredMesh, kernel: str = "ROMA_ET_AL_1999",
                 dtype=jnp.float32):
        self.mesh = mesh
        self.dim = mesh.dim
        self.kernel, self.half = KERNELS[kernel]
        self.K = 2 * self.half + 1
        self.dtype = dtype
        # static per-direction data
        self.vertex = [jnp.asarray(mesh.coord(Field.VERTEX, d), dtype)
                       for d in range(self.dim)]
        self.L = [float(mesh.max[d] - mesh.min[d]) for d in range(self.dim)]
        self.periodic = mesh.periodic
        # per-component, per-direction interior coords / widths / sizes
        self.coord = {c: [jnp.asarray(mesh.coord(Field(c), d), dtype)
                          for d in range(self.dim)] for c in range(self.dim)}
        self.dl = {c: [jnp.asarray(mesh.dl(Field(c), d), dtype)
                       for d in range(self.dim)] for c in range(self.dim)}
        self.n = {c: [mesh.n(Field(c), d) for d in range(self.dim)]
                  for c in range(self.dim)}
        # u-grid dl per direction for the kernel widths
        # (reference: createdelta.cpp:69-77)
        self.width_dl = [jnp.asarray(mesh.dl(Field.U, d), dtype)
                         for d in range(self.dim)]

    # ------------------------------------------------------------------
    def cell_index(self, X):
        """Owning pressure-cell index per point per direction (traced;
        reference: singlebodypoints.cpp:95-120)."""
        cols = []
        for d in range(self.dim):
            cols.append(jnp.searchsorted(self.vertex[d], X[:, d],
                                         side="right") - 1)
        return jnp.stack(cols, axis=1)

    def windows(self, X):
        """Banded factor matrices for all components.

        Returns {c: {"sd": [per-dir (N, n_d)], "sv": [per-dir (N, n_d)]}}
        where sd carries the 1D delta weights and sv additionally the
        component cell widths (prod over dirs of sv = delta * cell volume —
        the E scaling, reference: decoupledibpm.cpp:181-183).
        """
        X = jnp.asarray(X, self.dtype)
        npts = X.shape[0]
        ijk = self.cell_index(X)
        offsets = jnp.arange(-self.half, self.half + 1)
        # kernel widths from the u-grid cell of the first body point
        # (reference: createdelta.cpp:69-77 — assumes a uniform region)
        widths = [self.width_dl[d][ijk[0, d]] for d in range(self.dim)]

        out = {}
        for c in range(self.dim):
            sd_d, sv_d = [], []
            for d in range(self.dim):
                n = self.n[c][d]
                s = ijk[:, d:d + 1] + offsets[None, :]  # (N, K)
                if self.periodic[d]:
                    idx = jnp.mod(s, n)
                    shift = jnp.floor_divide(s, n).astype(self.dtype) * self.L[d]
                    x = self.coord[c][d][idx] + shift
                    valid = jnp.ones(s.shape, dtype=bool)
                else:
                    valid = (s >= 0) & (s < n)
                    idx = jnp.clip(s, 0, n - 1)
                    x = self.coord[c][d][idx]
                w = self.kernel(X[:, d:d + 1] - x, widths[d])
                w = jnp.where(valid, w, 0.0)
                # scatter the K window weights into banded rows by one-hot
                # comparison — a (N, K, n) mask reduction, no scatter op
                onehot = (idx[:, :, None]
                          == jnp.arange(n)[None, None, :]).astype(self.dtype)
                sd = jnp.einsum("pk,pkn->pn", w, onehot)
                sd_d.append(sd)
                sv_d.append(sd * self.dl[c][d][None, :])
            out[c] = {"sd": sd_d, "sv": sv_d}
        return out

    # ------------------------------------------------------------------
    def interpolate(self, q, win):
        """E u: volume-weighted interpolation onto the Lagrangian points;
        returns (N, dim)."""
        cols = []
        for c in range(self.dim):
            w = win[c]
            arr = q[VEL_NAMES[c]]
            if self.dim == 2:
                sy, sx = w["sv"][1], w["sv"][0]
                t = jnp.einsum("py,yx->px", sy, arr,
                               preferred_element_type=self.dtype)
                cols.append(jnp.sum(t * sx, axis=1))
            else:
                sz, sy, sx = w["sv"][2], w["sv"][1], w["sv"][0]
                t = jnp.einsum("pz,zyx->pyx", sz, arr,
                               preferred_element_type=self.dtype)
                t = jnp.einsum("py,pyx->px", sy, t,
                               preferred_element_type=self.dtype)
                cols.append(jnp.sum(t * sx, axis=1))
        return jnp.stack(cols, axis=1)

    def spread(self, f, win):
        """H f = Delta^T f: spread the Lagrangian forces onto the grids;
        f is (N, dim), returns a velocity-space dict."""
        out = {}
        for c in range(self.dim):
            w = win[c]
            fc = f[:, c]
            if self.dim == 2:
                sy, sx = w["sd"][1], w["sd"][0]
                out[VEL_NAMES[c]] = jnp.einsum(
                    "py,px->yx", sy * fc[:, None], sx,
                    preferred_element_type=self.dtype)
            else:
                sz, sy, sx = w["sd"][2], w["sd"][1], w["sd"][0]
                t = jnp.einsum("pz,py->pzy", sz * fc[:, None], sy,
                               preferred_element_type=self.dtype)
                out[VEL_NAMES[c]] = jnp.einsum(
                    "pzy,px->zyx", t, sx, preferred_element_type=self.dtype)
        return out
