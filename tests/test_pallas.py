"""Pallas DIA stencil kernel tests (interpret mode on CPU): the fused
5-point apply must match the matrix-free Poisson operator exactly."""

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


def test_pallas_declines_periodic_and_3d():
    mesh = StaggeredMesh(periodic_config(8, 6))
    mg = PoissonMG(mesh.dxp, mesh.periodic, dtype=jnp.float64)
    assert make_pallas_poisson(mg, interpret=True) is None


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
