"""Divergence-form convection N(u) as a fused stencil closure.

Reference math (src/operators/createconvection.cpp:40-195): for velocity
component c, ``N_c = sum_d d/dx_d (adv_d * face_c)`` where ``face_c`` is the
2-point average of component c onto its control-volume face in direction d
and ``adv_d`` the 2-point average of component d onto the same face; for
``d == c`` both are the same average so the term is ``(uE^2 - uW^2)/dL``.

The reference implements this as a MatShell whose MatMult scatters the
packed vector into ghosted local vectors (halo exchange) and runs pointwise
kernels; here each component is extended once by ``BoundarySet.extend``
(inhomogeneous — the convection term always sees the true ghost values,
navierstokes.cpp:462) and the averages are slice arithmetic that XLA fuses
into one pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..boundary import BoundarySet
from ..mesh import StaggeredMesh
from ..types import Field

VEL_NAMES = ("u", "v", "w")


def make_convection(mesh: StaggeredMesh, bcset: BoundarySet, dtype=jnp.float32):
    inv_dl = {}
    for c in range(mesh.dim):
        inv_dl[c] = [
            jnp.asarray(mesh.bcast(Field(c), d, 1.0 / mesh.dl(Field(c), d)),
                        dtype=dtype)
            for d in range(mesh.dim)
        ]

    def window(ext, out_shape, offsets):
        """Slice a window of ``out_shape`` from an extended array; offsets are
        per-direction shifts in grid-index space (array axes are reversed)."""
        idx = []
        for ax in range(ext.ndim):
            d = mesh.dim - 1 - ax
            off = offsets.get(d, 0)
            idx.append(slice(1 + off, 1 + off + out_shape[ax]))
        return ext[tuple(idx)]

    def convection(q, bcstate):
        ext = {c: bcset.extend(q[VEL_NAMES[c]], c, bcstate) for c in range(mesh.dim)}
        out = {}
        for c in range(mesh.dim):
            shape = q[VEL_NAMES[c]].shape
            total = None
            for d in range(mesh.dim):
                if d == c:
                    fW = 0.5 * (window(ext[c], shape, {d: -1})
                                + window(ext[c], shape, {d: 0}))
                    fE = 0.5 * (window(ext[c], shape, {d: 0})
                                + window(ext[c], shape, {d: 1}))
                    term = (fE * fE - fW * fW) * inv_dl[c][d]
                else:
                    aM = 0.5 * (window(ext[c], shape, {d: -1})
                                + window(ext[c], shape, {d: 0}))
                    aP = 0.5 * (window(ext[c], shape, {d: 0})
                                + window(ext[c], shape, {d: 1}))
                    advM = 0.5 * (window(ext[d], shape, {d: -1, c: 0})
                                  + window(ext[d], shape, {d: -1, c: 1}))
                    advP = 0.5 * (window(ext[d], shape, {d: 0, c: 0})
                                  + window(ext[d], shape, {d: 0, c: 1}))
                    term = (advP * aP - advM * aM) * inv_dl[c][d]
                total = term if total is None else total + term
            out[VEL_NAMES[c]] = total
        return out

    return convection
