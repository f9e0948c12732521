"""PCR tridiagonal solver: exactness vs direct solutions, and MG
convergence with the accelerator (PCR) smoother path forced on."""

import jax.numpy as jnp
import numpy as np

from petibm_tpu.linalg.tridiag import tridiag_solve_pcr


def _random_system(rng, batch, n):
    a = -rng.random(batch + (n,)) * 0.4
    c = -rng.random(batch + (n,)) * 0.4
    b = 1.0 + np.abs(a) + np.abs(c)  # strictly diagonally dominant
    x = rng.standard_normal(batch + (n,))
    d = b * x
    if n > 1:
        d[..., 1:] += a[..., 1:] * x[..., :-1]
        d[..., :-1] += c[..., :-1] * x[..., 1:]
    return a, b, c, d, x


def test_pcr_matches_direct_solutions():
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 7, 16, 100, 450):
        a, b, c, d, x = _random_system(rng, (4, 5), n)
        got = tridiag_solve_pcr(jnp.asarray(a), jnp.asarray(b),
                                jnp.asarray(c), jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(got), x, rtol=0, atol=1e-10)


def test_pcr_poisson_line_systems():
    """The smoother's actual systems: FV Poisson line matrices on a
    stretched grid (variable coefficients, large ratios)."""
    rng = np.random.default_rng(1)
    w = np.geomspace(1.0, 40.0, 128)  # strongly stretched widths
    inv = 1.0 / (0.5 * (w[:-1] + w[1:]))
    a = np.zeros(128)
    c = np.zeros(128)
    a[1:] = -inv
    c[:-1] = -inv
    b = -(a + c) + 1e-3  # shifted singular line matrix -> SPD
    x = rng.standard_normal((6, 128))
    d = b * x
    d[..., 1:] += a[1:] * x[..., :-1]
    d[..., :-1] += c[:-1] * x[..., 1:]
    got = tridiag_solve_pcr(*(jnp.asarray(np.broadcast_to(v, x.shape).copy())
                              for v in (a, b, c)), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-8, atol=1e-8)


def test_mgcg_with_pcr_smoother():
    """Force the PCR path (the accelerator default) on the CPU test mesh:
    MG-preconditioned CG must converge identically well."""
    from petibm_tpu.linalg.krylov import cg
    from petibm_tpu.linalg.mg import PoissonMG

    rng = np.random.default_rng(2)
    widths = [np.geomspace(1.0, 3.0, 48), np.geomspace(1.0, 2.0, 40)]
    mg = PoissonMG(widths, [False, False], dtype=jnp.float64)
    assert not mg.use_pcr  # CPU default
    mg.use_pcr = True
    rhs = rng.standard_normal((40, 48))
    rhs -= rhs.mean()
    rhs = jnp.asarray(rhs)
    sol = cg(lambda p: mg.apply_op(0, p), rhs, jnp.zeros_like(rhs),
             M=mg.preconditioner(), atol=1e-10, maxiter=60)
    assert bool(sol.converged)
    assert int(sol.iters) < 30
