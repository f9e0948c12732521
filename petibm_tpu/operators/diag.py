"""Diagonal operators R, R^-1, M-hat, M as broadcastable field dicts.

Reference (src/operators/creatediagmatrix.cpp:43-234): R holds the flux
areas at velocity points (product of the velocity grid's cell widths in the
perpendicular directions), M-hat the cell width along the component's own
direction, M = M-hat * R^-1.  Here they are dense per-component arrays used
by elementwise multiplication (velocity <-> flux conversion,
solutionsimple.cpp:90-119, and the IBM interpolation scaling).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mesh import StaggeredMesh
from ..types import Field

VEL_NAMES = ("u", "v", "w")


def make_r(mesh: StaggeredMesh, dtype=jnp.float32) -> dict:
    """Flux areas per velocity point (reference: createR, :90-117)."""
    out = {}
    for c in range(mesh.dim):
        area = np.ones([1] * mesh.dim)
        for d in range(mesh.dim):
            if d == c:
                continue
            area = area * mesh.bcast(Field(c), d, mesh.dl(Field(c), d))
        out[VEL_NAMES[c]] = jnp.asarray(
            np.broadcast_to(area, mesh.shape(Field(c))).copy(), dtype=dtype)
    return out


def make_rinv(mesh: StaggeredMesh, dtype=jnp.float32) -> dict:
    return {k: 1.0 / v for k, v in make_r(mesh, dtype).items()}


def make_mhat(mesh: StaggeredMesh, dtype=jnp.float32) -> dict:
    """Cell width along the component's own direction
    (reference: createMHead, :150-177)."""
    out = {}
    for c in range(mesh.dim):
        w = mesh.bcast(Field(c), c, mesh.dl(Field(c), c))
        out[VEL_NAMES[c]] = jnp.asarray(
            np.broadcast_to(w, mesh.shape(Field(c))).copy(), dtype=dtype)
    return out


def make_m(mesh: StaggeredMesh, dtype=jnp.float32) -> dict:
    """M = M-hat * R^-1 (reference: createM, :180-207)."""
    r = make_rinv(mesh, dtype)
    mh = make_mhat(mesh, dtype)
    return {k: mh[k] * r[k] for k in r}


# convenience alias used by the divergence factory
def make_flux_areas(mesh: StaggeredMesh, dtype=jnp.float32) -> dict:
    return make_r(mesh, dtype)


def _cached(mesh: StaggeredMesh, kind: str, dtype, builder):
    """Per-mesh cache for the diagonal-operator arrays, so repeated
    converter calls don't rebuild R / R^-1 each time."""
    cache = getattr(mesh, "_diag_cache", None)
    if cache is None:
        cache = mesh._diag_cache = {}
    key = (kind, jnp.dtype(dtype).name)
    if key not in cache:
        cache[key] = builder(mesh, dtype)
    return cache[key]


def convert_to_flux(mesh: StaggeredMesh, q: dict) -> dict:
    """Velocity -> flux through the staggered faces: Q = R u
    (reference: solutionsimple.cpp:107-119 convert2Flux)."""
    r = _cached(mesh, "r", next(iter(q.values())).dtype, make_r)
    return {k: q[k] * r[k] for k in q}


def convert_to_velocity(mesh: StaggeredMesh, q: dict) -> dict:
    """Flux -> velocity: u = R^-1 Q
    (reference: solutionsimple.cpp:90-105 convert2Velocity)."""
    rinv = _cached(mesh, "rinv", next(iter(q.values())).dtype, make_rinv)
    return {k: q[k] * rinv[k] for k in q}
