"""Direct fast-diagonalization solver for the pressure Poisson system.

Replaces the iterative CG + multigrid pressure solve (the reference's
``-ksp_type cg -pc_type gamg`` / AmgX path, navierstokes.cpp:566-580) for
BN order 1, where the operator -D B1 G is *exactly* a Kronecker sum of 1D
finite-volume operators:

    A  =  sum_d ( W_{d'!=d} (x) T_d ),      W_d = diag(cell widths),
                                            T_d = 1D FV Laplacian factor

(the same separable factorization ``linalg/mg.py`` stores as
``_Level.c1d/w1d`` and ``tests/test_mg.py`` verifies equals -D B1 G).

At setup, each direction's generalized symmetric eigenproblem

    T_d q = lambda W_d q     (host numpy, float64)

gives Q_d with Q_d^T W_d Q_d = I and Q_d^T T_d Q_d = diag(lambda_d), so

    (x)Q_d^T  A  (x)Q_d  =  diag( lambda_x (+) lambda_y [(+) lambda_z] )

and a solve is: transform the RHS by the Q_d^T factors (dense matmuls on
the MXU), divide by the eigenvalue Kronecker sum (the all-Neumann constant
nullspace mode is zeroed — the eigenspace analogue of the reference's
MatNullSpace mean projection, navierstokes.cpp:400-412), and transform
back.  Machine-precision accurate, non-iterative, and all FLOPs live in
large dense matmuls — the TPU-native formulation of this solve.

Both periodic (circulant-tridiagonal T_d, handled by the same dense eigh)
and non-periodic (Neumann wall, c=0 faces) directions work, in 2D and 3D,
on arbitrarily stretched grids.

``make_fdm_solver`` wraps the direct solve in KSP-compatible clothing:
residual check against ``max(atol, rtol*||b||)``, optional iterative
refinement (x += A~^-1 r) when low-precision rounding leaves the first
residual above tolerance, and ``SolveResult`` stats for the iterations
log (linsolverksp.cpp:96-104 semantics; `iters` counts refinements).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .krylov import SolveResult, _norm


def line_operator(widths: np.ndarray, periodic: bool, scale: float) -> np.ndarray:
    """Dense 1D FV operator T_d (float64): face coefficient scale/dist,
    zero-flux at non-periodic walls, wraparound where periodic — the same
    construction as PoissonMG's finest level (mg.py:120-127)."""
    w = np.asarray(widths, np.float64)
    n = len(w)
    c = np.zeros(n + 1)
    c[1:-1] = 1.0 / (0.5 * (w[:-1] + w[1:]))
    if periodic:
        c[0] = c[-1] = 1.0 / (0.5 * (w[0] + w[-1]))
    c *= scale
    T = np.zeros((n, n))
    idx = np.arange(n)
    T[idx, idx] = c[:-1] + c[1:]
    T[idx[1:], idx[:-1]] -= c[1:-1]
    T[idx[:-1], idx[1:]] -= c[1:-1]
    if periodic and n > 1:
        T[0, -1] -= c[0]
        T[-1, 0] -= c[0]
    return T


class FastDiagPoisson:
    """Direct separable Poisson solver via per-direction eigendecomposition.

    Solves (positive semidefinite) ``A x = b`` where A is the *negated*
    -D B1 G operator — the same sign convention as PoissonMG/apply_op.
    """

    def __init__(self, dxp: list[np.ndarray], periodic: list[bool],
                 dtype=jnp.float32, scale: float = 1.0,
                 precision: str = "highest", null_rtol: float = 1e-12):
        """``dxp``: pressure cell widths per direction (x, y[, z]);
        ``scale``: the dt factor of B1; ``precision``: matmul precision for
        the eigenvector transforms ('highest' = full f32 accumulation on
        TPU; 'default' trades ~1e-3 transform accuracy for 6x fewer MXU
        passes — the refinement loop absorbs the difference)."""
        self.dim = len(dxp)
        self.dtype = dtype
        self.precision = jax.lax.Precision(
            {"highest": "highest", "default": "default",
             "high": "high"}[str(precision).lower()])

        qs, qts, lams = [], [], []
        for d in range(self.dim):
            w = np.asarray(dxp[d], np.float64)
            T = line_operator(w, periodic[d], scale)
            # generalized symmetric eigenproblem T q = lam W q via the
            # W^{-1/2} similarity: S = W^-1/2 T W^-1/2, Q = W^-1/2 V
            s = 1.0 / np.sqrt(w)
            S = T * s[:, None] * s[None, :]
            lam, V = np.linalg.eigh(S)
            Q = s[:, None] * V
            qs.append(jnp.asarray(Q, dtype))
            qts.append(jnp.asarray(Q.T.copy(), dtype))
            lams.append(np.maximum(lam, 0.0))

        # eigenvalue Kronecker sum over the (z, y[, x]) grid, inverted in
        # f64 with the nullspace mode(s) zeroed: lam_sum ~ 0 only at the
        # product of each direction's constant mode (all-Neumann/periodic)
        shape = tuple(reversed([len(np.asarray(d)) for d in dxp]))
        lam_sum = np.zeros(shape)
        for d, lam in enumerate(lams):
            bshape = [1] * self.dim
            bshape[self.dim - 1 - d] = len(lam)
            lam_sum = lam_sum + lam.reshape(bshape)
        cutoff = null_rtol * lam_sum.max()
        self.inv_lam = jnp.asarray(
            np.where(lam_sum > cutoff, 1.0 / np.where(lam_sum > 0, lam_sum, 1.0),
                     0.0), dtype)
        self._Q = qs
        self._Qt = qts

    def _transform(self, mats: list, x):
        """Apply mats[d] along direction d's axis (dense matmul per axis)."""
        for d in range(self.dim):
            axis = self.dim - 1 - d
            x = jnp.moveaxis(
                jnp.tensordot(mats[d], x, axes=((1,), (axis,)),
                              precision=self.precision), 0, axis)
        return x

    def solve(self, b):
        """x = A^+ b: the inconsistent (nonzero plain-sum) component of b
        is projected out first — Q Lam^+ Q^T alone is only a *reflexive*
        generalized inverse, so on stretched grids a nonzero-sum b would
        otherwise leak through the non-W-orthogonality of the constant
        mode (tests/test_fdm.py::test_nullspace_component_discarded).
        The returned x carries no nullspace component in the W-weighted
        inner product."""
        b = b.astype(self.dtype)
        b = b - jnp.mean(b)  # range(A) = plain-sum-zero vectors
        bhat = self._transform(self._Qt, b)
        return self._transform(self._Q, bhat * self.inv_lam)


def make_fdm_solver(fdm: FastDiagPoisson, A, opts: dict):
    """Direct solve + iterative refinement with KSP stopping semantics.

    ``A`` is the (negated, PSD) Poisson operator used for the residual —
    typically the fused Pallas apply.  Returns ``solve(b, x0) ->
    SolveResult``; ``x0`` is ignored (direct methods need no initial
    guess).  A stagnation exit (residual shrinking by < 10% per pass)
    reports non-convergence instead of looping to max_it, the analogue of
    KSP_DIVERGED_BREAKDOWN."""
    atol = float(opts.get("atol", 1e-6))
    rtol = float(opts.get("rtol", 0.0))
    maxiter = int(opts.get("max_it", 10000))

    def solve(b, x0):
        del x0
        x = fdm.solve(b)
        r = b - A(x)
        tol = jnp.maximum(atol, rtol * _norm(b))
        rnorm = _norm(r)

        def cond(state):
            _, _, rn, prev, it = state
            return (rn > tol) & (rn < 0.9 * prev) & (it < maxiter)

        def body(state):
            x, r, rn, _, it = state
            x = x + fdm.solve(r)
            r = b - A(x)
            return x, r, _norm(r), rn, it + 1

        big = jnp.asarray(np.inf, rnorm.dtype)
        x, r, rnorm, _, it = jax.lax.while_loop(
            cond, body, (x, r, rnorm, big, jnp.asarray(0, jnp.int32)))
        return SolveResult(x=x, iters=it, residual=rnorm,
                           converged=rnorm <= tol)

    return solve
