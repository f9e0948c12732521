"""Regularized delta kernels.

Reference (src/misc/delta.cpp:17-62): Roma et al. (1999) 3-point kernel
(window half-width 2) and Peskin (2002) 4-point kernel (half-width 3);
the nD delta is the tensor product of 1D kernels.  Here the kernels are
vectorized jnp functions usable inside jit (moving bodies re-evaluate them
every step without recompilation).
"""

from __future__ import annotations

import jax.numpy as jnp


def roma_1999(r, dr):
    """Roma et al. 1999 3-pt kernel (reference: delta.cpp:17-27)."""
    x = jnp.abs(r) / dr
    inner = (1.0 + jnp.sqrt(jnp.maximum(1.0 - 3.0 * x * x, 0.0))) / (3.0 * dr)
    mid = (5.0 - 3.0 * x
           - jnp.sqrt(jnp.maximum(1.0 - 3.0 * (1.0 - x) ** 2, 0.0))) / (6.0 * dr)
    return jnp.where(x > 1.5, 0.0, jnp.where(x > 0.5, mid, inner))


def peskin_2002(r, dr):
    """Peskin 2002 4-pt kernel (reference: delta.cpp:30-39)."""
    x = jnp.abs(r) / dr
    near = (3.0 - 2.0 * x
            + jnp.sqrt(jnp.maximum(1.0 + 4.0 * x - 4.0 * x * x, 0.0))) / (8.0 * dr)
    far = (5.0 - 2.0 * x
           - jnp.sqrt(jnp.maximum(-7.0 + 12.0 * x - 4.0 * x * x, 0.0))) / (8.0 * dr)
    return jnp.where(x > 2.0, 0.0, jnp.where(x > 1.0, far, near))


# name -> (kernel fn, window half-width) (reference: delta.cpp:42-62)
KERNELS = {
    "ROMA_ET_AL_1999": (roma_1999, 2),
    "PESKIN_2002": (peskin_2002, 3),
}
