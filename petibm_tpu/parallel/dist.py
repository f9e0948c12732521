"""Device-mesh creation and state sharding.

Strategy (SURVEY.md §2 parallelism checklist): the only parallelism in this
problem class is spatial domain decomposition.  The pressure/velocity grids
are block-partitioned over a 2D device mesh (axes named "dy", "dx"
sharding the trailing two array axes); in 3D the z axis stays local, which
matches the bandwidth-optimal layout for x-fastest arrays.  Small per-face
BC arrays and solver scalars are replicated.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor2(n: int) -> tuple[int, int]:
    """Near-square factorization n = a*b with a <= b."""
    a = int(math.isqrt(n))
    while a > 1 and n % a != 0:
        a -= 1
    return a, n // a


def device_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A ("dy", "dx") mesh over the available (or given) devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    a, b = _factor2(n)
    return Mesh(np.asarray(devices).reshape(a, b), ("dy", "dx"))


def _leaf_spec(leaf) -> P:
    """PartitionSpec for one state leaf: shard the trailing two axes of
    2D/3D field arrays; replicate 1D/scalar leaves (BC faces, stats)."""
    ndim = getattr(leaf, "ndim", 0)
    if ndim >= 2:
        return P(*([None] * (ndim - 2) + ["dy", "dx"]))
    return P()


def state_shardings(mesh: Mesh, state):
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf)), state)


def shard_state(mesh: Mesh, state):
    """Place a state pytree onto the device mesh (requires divisible dims —
    prefer :func:`constrain_state` inside jit for staggered grids, whose
    per-field sizes differ by one and cannot all divide the mesh)."""
    return jax.device_put(state, state_shardings(mesh, state))


def constrain_state(mesh: Mesh, state):
    """Annotate a state pytree with mesh shardings inside jit.

    Unlike explicit input shardings, ``with_sharding_constraint`` accepts
    uneven dimensions (GSPMD pads internally), which is exactly what the
    staggered grids need: u is (ny, nx-1) while p is (ny, nx).
    """
    return jax.tree_util.tree_map(
        lambda leaf: jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, _leaf_spec(leaf))), state)
