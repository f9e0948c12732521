"""Matrix-free preconditioned CG and BiCGStab over arbitrary pytrees.

Replaces PETSc KSP (reference: src/linsolver/linsolverksp.cpp:48-107): the
reference's velocity solve is BiCGStab + Jacobi, the Poisson solve CG + AMG.
Stopping criterion matches KSP's default ``||r|| <= max(atol, rtol*||b||)``
with the reference example tolerances (atol 1e-6, rtol 0; BASELINE.md).

Everything runs inside ``lax.while_loop`` so a whole time step jits into a
single XLA computation; iteration counts and final residuals are returned
for the per-step iterations log (reference: navierstokes.cpp:766-794).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

tmap = jax.tree_util.tree_map


class SolverDivergedError(RuntimeError):
    """A linear solver failed to reach its tolerance within max_it.

    The reference hard-aborts in this situation with the solver name,
    iteration count, and residual (linsolverksp.cpp:96-104); solvers raise
    this from the buffered-stats flush so the failing step is identified
    without per-step device syncs."""


def _dot(x, y):
    leaves = jax.tree_util.tree_leaves(tmap(lambda a, b: jnp.sum(a * b), x, y))
    return sum(leaves)


def _norm(x):
    return jnp.sqrt(_dot(x, x))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveResult:
    x: object
    iters: jnp.ndarray
    residual: jnp.ndarray
    converged: jnp.ndarray


def _identity(x):
    return x


def cg(A, b, x0, M=None, atol=1e-6, rtol=0.0, maxiter=10000) -> SolveResult:
    """Preconditioned conjugate gradient (matches KSPCG semantics).

    ||r||^2 is computed in the body next to r.z — one fused streaming
    pass over r (one psum under sharding) — and carried into ``cond``,
    instead of re-reducing r every convergence check (the round-3 code
    paid one extra global reduction per iteration; at the ~1-7-iteration
    latency-bound solves of a production step each reduction counts)."""
    M = M or _identity
    r = tmap(lambda bi, ax: bi - ax, b, A(x0))
    z = M(r)
    p = z
    rz = _dot(r, z)
    rr = _dot(r, r)
    tol = jnp.maximum(atol, rtol * _norm(b))
    tol2 = tol * tol

    def cond(state):
        _, _, _, _, rr, it = state
        return jnp.logical_and(rr > tol2, it < maxiter)

    def body(state):
        x, r, p, rz, _, it = state
        ap = A(p)
        alpha = rz / _dot(p, ap)
        x = tmap(lambda xi, pi: xi + alpha * pi, x, p)
        r = tmap(lambda ri, api: ri - alpha * api, r, ap)
        z = M(r)
        rz_new = _dot(r, z)
        rr_new = _dot(r, r)
        beta = rz_new / rz
        p = tmap(lambda zi, pi: zi + beta * pi, z, p)
        return x, r, p, rz_new, rr_new, it + 1

    x, r, p, rz, rr, it = jax.lax.while_loop(
        cond, body, (x0, r, p, rz, rr, jnp.asarray(0, jnp.int32)))
    res = jnp.sqrt(rr)
    return SolveResult(x=x, iters=it, residual=res, converged=res <= tol)


def bicgstab(A, b, x0, M=None, atol=1e-6, rtol=0.0, maxiter=10000) -> SolveResult:
    """Preconditioned BiCGStab (matches KSPBCGS semantics).

    ||r||^2 for the convergence check comes from the recurrence
    r = s - omega t:  ||r||^2 = s.s - (t.s)^2 / t.t  (omega = t.s/t.t),
    so the extra s.s reduction fuses into the body's existing t.s / t.t
    pass and ``cond`` re-reduces nothing (see cg)."""
    M = M or _identity
    r = tmap(lambda bi, ax: bi - ax, b, A(x0))
    r0 = r
    bnorm = _norm(b)
    tol = jnp.maximum(atol, rtol * bnorm)
    tol2 = tol * tol
    dtype = bnorm.dtype
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    zero_x = tmap(jnp.zeros_like, x0)
    rr = _dot(r, r)

    # state: x, r, p, v, rho, alpha, omega, rr, it
    init = (x0, r, zero_x, zero_x, one, one, one, rr,
            jnp.asarray(0, jnp.int32))

    def cond(state):
        *_, rr, it = state
        return jnp.logical_and(rr > tol2, it < maxiter)

    def body(state):
        x, r, p, v, rho, alpha, omega, _, it = state
        rho_new = _dot(r0, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = tmap(lambda ri, pi, vi: ri + beta * (pi - omega * vi), r, p, v)
        phat = M(p)
        v = A(phat)
        alpha = rho_new / _dot(r0, v)
        s = tmap(lambda ri, vi: ri - alpha * vi, r, v)
        shat = M(s)
        t = A(shat)
        tt = _dot(t, t)
        ts = _dot(t, s)
        ss = _dot(s, s)
        omega = jnp.where(tt > 0, ts / jnp.where(tt > 0, tt, one), one)
        x = tmap(lambda xi, ph, sh: xi + alpha * ph + omega * sh, x, phat, shat)
        r = tmap(lambda si, ti: si - omega * ti, s, t)
        rr = jnp.maximum(ss - 2.0 * omega * ts + omega * omega * tt, zero)
        return x, r, p, v, rho_new, alpha, omega, rr, it + 1

    x, r, p, v, rho, alpha, omega, rr, it = jax.lax.while_loop(
        cond, body, init)
    res = _norm(r)  # one final exact norm for the iterations log
    # the recurrence rr can disagree with the exact norm by cancellation
    # right at the tolerance boundary; either passing counts as converged
    ok = jnp.logical_or(res <= tol, rr <= tol2)
    return SolveResult(x=x, iters=it, residual=res, converged=ok)


_METHODS = {"cg": cg, "bicgstab": bicgstab}


def make_solver(A, opts: dict, M=None):
    """Bind an operator + solver options into ``solve(b, x0) -> SolveResult``
    (the native analogue of linsolver::createLinSolver,
    reference: src/linsolver/linsolver.cpp:57-91)."""
    method = _METHODS[opts.get("type", "cg")]
    return partial(_solve, method, A, M, float(opts.get("atol", 1e-6)),
                   float(opts.get("rtol", 0.0)), int(opts.get("max_it", 10000)))


def _solve(method, A, M, atol, rtol, maxiter, b, x0):
    return method(A, b, x0, M=M, atol=atol, rtol=rtol, maxiter=maxiter)
