"""Fused line-smoother sweep kernel (linalg/pallas_sweep.py) vs the
unfused build-couplings -> batched-tridiag -> damped-update path."""

import jax.numpy as jnp
import numpy as np
import pytest

from petibm_tpu.linalg.mg import PoissonMG


def _mg(ns, stretched=True, dtype=jnp.float64, **kw):
    rng = np.random.default_rng(3)
    widths = [(np.geomspace(1.0, 1.8, n) if stretched else np.ones(n)) / n
              for n in ns]
    mg = PoissonMG(widths, [False] * len(ns), dtype=dtype, scale=0.02, **kw)
    shape = tuple(reversed(ns))
    phi = jnp.asarray(rng.standard_normal(shape), dtype)
    rhs = jnp.asarray(rng.standard_normal(shape), dtype)
    return mg, phi, rhs


@pytest.mark.parametrize("ns", [[40, 24], [16, 12, 24]])
def test_fused_sweep_matches_unfused(ns):
    mg, phi, rhs = _mg(ns)
    outs = {}
    for fused in (False, True):
        mg.use_pcr = fused
        mg._pallas_interpret = fused  # interpret-mode kernel on CPU
        outs[fused] = [np.asarray(mg._line_sweep(0, phi, rhs, d))
                       for d in range(len(ns))]
    for d in range(len(ns)):
        np.testing.assert_allclose(outs[True][d], outs[False][d],
                                   rtol=1e-9, atol=1e-11)


def test_fused_smooth_and_vcycle_match(ns=[40, 24]):
    """Whole smooth() and vcycle() agree between the fused kernel path and
    the LAPACK-backed unfused path (same math, different backends)."""
    mg, phi, rhs = _mg(ns)
    res = {}
    for fused in (False, True):
        mg.use_pcr = fused
        mg._pallas_interpret = fused
        res[fused] = (np.asarray(mg.smooth(0, phi, rhs, 2)),
                      np.asarray(mg.vcycle(0, rhs)))
    np.testing.assert_allclose(res[True][0], res[False][0],
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(res[True][1], res[False][1],
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("ns", [[16, 12, 24], [13, 10, 24]])
def test_blocked_fused_sweep_matches_unfused(monkeypatch, ns):
    """Too-large-for-VMEM dispatch: partial-b + blocked kernel, including
    non-divisible (partial edge) blocks and every line direction."""
    import petibm_tpu.linalg.pallas_sweep as psw

    mg, phi, rhs = _mg(ns)
    want = []
    mg.use_pcr = False
    mg._pallas_interpret = False
    for d in range(len(ns)):
        want.append(np.asarray(mg._line_sweep(0, phi, rhs, d)))

    with monkeypatch.context() as mp:
        mp.setattr(psw, "sweep_fits_vmem", lambda *a, **k: False)

        def tiny_pick(shape, line_axis, dtype, budget=None):
            # interpret mode needs no tile alignment: force tiny blocks so
            # the 13/12-extent axes get partial edge blocks
            return (0 if line_axis % len(shape) != 0 else 1), 5
        mp.setattr(psw, "pick_sweep_block", tiny_pick)
        # mg imports names inside _line_sweep, so patch the module attrs
        mg.use_pcr = True
        mg._pallas_interpret = True
        for d in range(len(ns)):
            got = np.asarray(mg._line_sweep(0, phi, rhs, d))
            np.testing.assert_allclose(got, want[d], rtol=1e-9, atol=1e-11,
                                       err_msg=f"direction {d}")


def test_fused_sweep_declines_periodic():
    """Periodic directions must take the unfused path (cyclic systems)."""
    rng = np.random.default_rng(0)
    widths = [np.ones(16) / 16, np.ones(24) / 24]
    mg = PoissonMG(widths, [True, False], dtype=jnp.float64)
    mg.use_pcr = True
    mg._pallas_interpret = True
    phi = jnp.asarray(rng.standard_normal((24, 16)))
    rhs = jnp.asarray(rng.standard_normal((24, 16)))
    # must not raise and must match the reference path
    got = np.asarray(mg._line_sweep(0, phi, rhs, 0))
    mg.use_pcr = False
    mg._pallas_interpret = False
    want = np.asarray(mg._line_sweep(0, phi, rhs, 0))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)
