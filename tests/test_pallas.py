"""Pallas stencil kernel tests (interpret mode on CPU): the fused
whole-array separable apply must match the matrix-free Poisson operator
exactly, and the dispatcher must decline everything else."""

import jax.numpy as jnp
import numpy as np

from petibm_tpu.boundary import BoundarySet
from petibm_tpu.linalg.mg import PoissonMG
from petibm_tpu.mesh import StaggeredMesh
from petibm_tpu.operators.pallas_stencil import make_pallas_poisson
from petibm_tpu.solvers.navierstokes import NavierStokesSolver
from petibm_tpu.types import Field

from test_mesh import cavity_config, periodic_config
from test_mg import neg_poisson
from test_navierstokes import run_config


def test_pallas_poisson_matches_operator():
    cfg = cavity_config(20, 17)
    cfg["mesh"][0]["subDomains"][0]["stretchRatio"] = 1.15
    mesh = StaggeredMesh(cfg)
    bcs = BoundarySet(mesh, cfg)
    negA = neg_poisson(mesh, bcs, dt=0.02)
    mg = PoissonMG(mesh.dxp, mesh.periodic, dtype=jnp.float64, scale=0.02)
    fused = make_pallas_poisson(mg, interpret=True)
    assert fused is not None
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal(mesh.shape(Field.P)))
    np.testing.assert_allclose(np.asarray(fused(phi)), np.asarray(negA(phi)),
                               rtol=1e-12, atol=1e-14)


def test_pallas_declines_periodic():
    mesh = StaggeredMesh(periodic_config(8, 6))
    mg = PoissonMG(mesh.dxp, mesh.periodic, dtype=jnp.float64)
    assert make_pallas_poisson(mg, interpret=True) is None


def _random_mg(shape_xy, seed=0, dim_widths=None, periodic=None):
    """PoissonMG on stretched widths; returns (mg, random phi)."""
    rng = np.random.default_rng(seed)
    widths = dim_widths or [np.geomspace(1.0, 1.7, n) for n in shape_xy]
    mg = PoissonMG(widths, periodic or [False] * len(widths),
                   dtype=jnp.float64, scale=0.01)
    shape = tuple(len(w) for w in reversed(widths))
    phi = jnp.asarray(rng.standard_normal(shape))
    return mg, phi


def test_make_pallas_poisson_dispatch(monkeypatch):
    import petibm_tpu.operators.pallas_stencil as ps

    # small 2D -> whole-array kernel; shrink the budget -> tiled kernel
    mg, phi = _random_mg([128, 64])  # shape (64, 128)
    want = np.asarray(mg.apply_op(0, phi))
    fn = ps.make_pallas_poisson(mg, interpret=True)
    assert fn is not None
    np.testing.assert_allclose(np.asarray(fn(phi)), want, rtol=1e-12,
                               atol=1e-13)
    with monkeypatch.context() as mp:
        # 300k: the whole-array live set (5 arrays, 327k) exceeds it ->
        # no kernel; XLA's streaming stencil owns larger-than-VMEM grids
        # (the tiled variants were deleted after losing to XLA, see
        # pallas_stencil.py's module docstring)
        mp.setattr(ps, "_VMEM_BUDGET", 300_000)
        assert ps.make_pallas_poisson(mg, interpret=True) is None
    # 3D dispatch (small enough for the whole-array kernel)
    mg3, phi3 = _random_mg([10, 12, 32])
    fn3 = ps.make_pallas_poisson(mg3, interpret=True)
    assert fn3 is not None
    np.testing.assert_allclose(np.asarray(fn3(phi3)),
                               np.asarray(mg3.apply_op(0, phi3)),
                               rtol=1e-12, atol=1e-13)


def test_solver_with_pallas_matches_without(tmp_path):
    """End-to-end: 5 cavity steps with and without the fused kernel give
    identical fields (same operator, same Krylov path)."""
    cfg_a = run_config(tmp_path / "a", nt=5)
    sa = NavierStokesSolver(cfg_a)
    sa.run()
    sa.close()
    cfg_b = run_config(tmp_path / "b", nt=5)
    cfg_b["parameters"]["disablePallas"] = True
    sb = NavierStokesSolver(cfg_b)
    sb.run()
    sb.close()
    np.testing.assert_allclose(np.asarray(sa.state["q"]["u"]),
                               np.asarray(sb.state["q"]["u"]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sa.state["p"]),
                               np.asarray(sb.state["p"]), atol=1e-12)


def test_separable_kernels_match_operator():
    """Whole-array separable kernel (2D and 3D) against the matrix-free
    operator."""
    import petibm_tpu.operators.pallas_stencil as ps

    for ns in ([48, 32], [12, 10, 32]):
        mg, phi = _random_mg(ns)
        aux = ps.separable_aux(mg.levels[0])
        want = np.asarray(mg.apply_op(0, phi))
        got = ps.poisson_apply_separable(phi, aux, interpret=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12,
                                   atol=1e-13)


def test_pallas_momentum_matches_stencil_3d():
    """The z-blocked fused momentum apply (make_pallas_momentum) must
    reproduce A u = u/dt - cnu*L u from the extend-based homogeneous
    Laplacian on a mixed periodic/wall 3D mesh."""
    import petibm_tpu.operators.pallas_stencil as ps
    from petibm_tpu.operators.stencil import VEL_NAMES, make_laplacian

    cfg = cavity_config(10, 12)
    cfg["mesh"].append({"direction": "z", "start": 0.0, "subDomains": [
        {"end": 1.0, "cells": 16, "stretchRatio": 1.0}]})
    cfg["flow"]["boundaryConditions"] = [
        {"location": "xMinus", "u": ["DIRICHLET", 0.0],
         "v": ["DIRICHLET", 0.0], "w": ["DIRICHLET", 0.0]},
        {"location": "xPlus", "u": ["DIRICHLET", 0.0],
         "v": ["DIRICHLET", 0.0], "w": ["DIRICHLET", 0.0]},
        {"location": "yMinus", "u": ["NEUMANN", 0.0],
         "v": ["DIRICHLET", 0.0], "w": ["DIRICHLET", 0.0]},
        {"location": "yPlus", "u": ["DIRICHLET", 1.0],
         "v": ["DIRICHLET", 0.0], "w": ["DIRICHLET", 0.0]},
        {"location": "zMinus", "u": ["PERIODIC", 0.0],
         "v": ["PERIODIC", 0.0], "w": ["PERIODIC", 0.0]},
        {"location": "zPlus", "u": ["PERIODIC", 0.0],
         "v": ["PERIODIC", 0.0], "w": ["PERIODIC", 0.0]},
    ]
    mesh = StaggeredMesh(cfg)
    bcs = BoundarySet(mesh, cfg)
    dt, cnu = 0.01, 0.037
    lap = make_laplacian(mesh, bcs, jnp.float64)
    fused = ps.make_pallas_momentum(mesh, bcs, dt, cnu, jnp.float64,
                                    interpret=True)
    assert fused is not None
    rng = np.random.default_rng(3)
    q = {VEL_NAMES[c]: jnp.asarray(
        rng.standard_normal(mesh.shape(Field(c)))) for c in range(3)}
    lu = lap(q, None, homogeneous=True)
    got = fused(q)
    for c in range(3):
        name = VEL_NAMES[c]
        want = np.asarray(q[name]) / dt - cnu * np.asarray(lu[name])
        np.testing.assert_allclose(np.asarray(got[name]), want,
                                   rtol=1e-11, atol=1e-12)


def test_pallas_poisson_zblocked_matches_operator():
    """The z-blocked scaled Poisson kernel against mg.apply_op on 3D
    stretched non-periodic and mixed-periodic grids (incl. a z size the
    block grid does not tile)."""
    import petibm_tpu.operators.pallas_stencil as ps

    for ns, per in (([12, 10, 32], [False, False, False]),
                    ([13, 16, 32], [True, True, False]),
                    ([16, 10, 24], [False, True, True])):
        mg, phi = _random_mg(ns, periodic=per)
        apply_z = ps.make_pallas_poisson_zblocked(mg, interpret=True)
        assert apply_z is not None, (ns, per)
        want = np.asarray(mg.apply_op(0, phi))
        got = np.asarray(apply_z(phi))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_pallas_convection_matches_closure():
    """The fused 3D convection kernel against the slice-arithmetic
    closure on a mixed periodic/wall mesh (exact in interpret mode)."""
    import petibm_tpu.operators.pallas_stencil as ps
    from petibm_tpu.operators.convection import make_convection
    from petibm_tpu.operators.stencil import VEL_NAMES

    cfg = cavity_config(12, 10)
    cfg["mesh"].append({"direction": "z", "start": 0.0, "subDomains": [
        {"end": 1.0, "cells": 13, "stretchRatio": 1.02}]})
    cfg["flow"]["boundaryConditions"] = [
        {"location": "xMinus", "u": ["DIRICHLET", 0.3],
         "v": ["DIRICHLET", 0.0], "w": ["DIRICHLET", 0.0]},
        {"location": "xPlus", "u": ["DIRICHLET", 0.3],
         "v": ["DIRICHLET", 0.0], "w": ["DIRICHLET", 0.0]},
        {"location": "yMinus", "u": ["PERIODIC", 0.0],
         "v": ["PERIODIC", 0.0], "w": ["PERIODIC", 0.0]},
        {"location": "yPlus", "u": ["PERIODIC", 0.0],
         "v": ["PERIODIC", 0.0], "w": ["PERIODIC", 0.0]},
        {"location": "zMinus", "u": ["NEUMANN", 0.0],
         "v": ["DIRICHLET", 0.0], "w": ["DIRICHLET", 0.1]},
        {"location": "zPlus", "u": ["DIRICHLET", 1.0],
         "v": ["DIRICHLET", 0.0], "w": ["DIRICHLET", 0.0]},
    ]
    mesh = StaggeredMesh(cfg)
    bcs = BoundarySet(mesh, cfg)
    conv_ref = make_convection(mesh, bcs, jnp.float64)
    conv_pl = ps.make_pallas_convection(mesh, bcs, jnp.float64,
                                        interpret=True, bz=4)
    assert conv_pl is not None
    rng = np.random.default_rng(7)
    q = {VEL_NAMES[c]: jnp.asarray(
        rng.standard_normal(mesh.shape(Field(c)))) for c in range(3)}
    bcstate = bcs.init_state(q)
    want = conv_ref(q, bcstate)
    got = conv_pl(q, bcstate)
    for c in range(3):
        np.testing.assert_allclose(np.asarray(got[VEL_NAMES[c]]),
                                   np.asarray(want[VEL_NAMES[c]]),
                                   rtol=1e-12, atol=1e-12)
