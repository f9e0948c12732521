"""Exact diagonal extraction for matrix-free stencil operators.

The Jacobi preconditioner needs diag(A).  For a stencil operator with
radius r, points whose coordinates agree modulo a per-axis period p > r
never interact through that axis, so probing A with the lattice-coloring
indicator vectors recovers the exact diagonal:
``diag = sum_colors e_c * A(e_c)``.

Periodic wraparound connects indices at distance n - k (k <= r); the
per-axis period is bumped until ``n % p == 0`` or ``n % p > r`` so no two
same-color indices interact through the wrap either.

This replaces the assembled-matrix MatGetDiagonal the reference gets for
free from PETSc AIJ; it runs once at setup under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _axis_period(n: int, radius: int) -> int:
    p = radius + 1
    while p < n and not (n % p == 0 or n % p > radius):
        p += 1
    return min(p, n)


def _color_masks(shape, radius: int, dtype):
    periods = [_axis_period(s, radius) for s in shape]
    grids = np.meshgrid(*[np.arange(s) % p for s, p in zip(shape, periods)],
                        indexing="ij")
    masks = []
    for combo in np.ndindex(*periods):
        m = np.ones(shape, dtype=bool)
        for g, c in zip(grids, combo):
            m &= g == c
        masks.append(jnp.asarray(m.astype(dtype)))
    return masks


def extract_diagonal(A, template, radius: int = 1):
    """diag(A) for a pytree->pytree stencil operator.

    ``template`` is a pytree of arrays with the operator's input
    shapes/dtypes.  ``radius`` is the stencil radius (1 for the 5/7-point
    Laplacian and D*B1*G; larger for higher-order B_N compositions).
    Each leaf is probed separately (cross-leaf coupling only contributes to
    off-block entries, never to the diagonal of another leaf).
    """
    leaves, treedef = jax.tree_util.tree_flatten(template)
    diags = []
    for idx, leaf in enumerate(leaves):
        masks = _color_masks(leaf.shape, radius, leaf.dtype)
        acc = jnp.zeros_like(leaf)
        for m in masks:
            probe = [jnp.zeros_like(l) for l in leaves]
            probe[idx] = m
            out = A(jax.tree_util.tree_unflatten(treedef, probe))
            out_leaf = jax.tree_util.tree_leaves(out)[idx]
            acc = acc + m * out_leaf
        diags.append(acc)
    return jax.tree_util.tree_unflatten(treedef, diags)
