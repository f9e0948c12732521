"""End-to-end NavierStokesSolver tests: projection correctness, output file
layout, exact restart, and Ghia et al. (1982) cavity validation
(reference physics targets: doc/markdowns/examples2d.md:25-33)."""

import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from petibm_tpu.operators import make_divergence
from petibm_tpu.solvers.navierstokes import NavierStokesSolver

from test_mesh import cavity_config


def run_config(tmp_path, nt=10, nsave=10, nrestart=10, n=16, start_step=0):
    cfg = cavity_config(n, n)
    cfg["flow"]["boundaryConditions"][3]["u"] = ["DIRICHLET", 1.0]  # lid
    cfg["parameters"] = {
        "dt": 0.01, "startStep": start_step, "nt": nt, "nsave": nsave,
        "nrestart": nrestart, "convection": "ADAMS_BASHFORTH_2",
        "diffusion": "CRANK_NICOLSON",
        "velocitySolver": {"type": "CPU"},
        "poissonSolver": {"type": "CPU"},
    }
    cfg["directory"] = str(tmp_path)
    cfg["output"] = str(tmp_path / "output")
    cfg["logs"] = str(tmp_path / "output" / "logs")
    return cfg


def test_cavity_short_run_outputs(tmp_path):
    cfg = run_config(tmp_path, nt=10)
    solver = NavierStokesSolver(cfg)
    solver.run()
    solver.close()
    out = tmp_path / "output"
    assert (out / "grid.h5").exists()
    assert (out / "0000000.h5").exists()
    assert (out / "0000010.h5").exists()
    assert (out / "iterations-0.txt").exists()
    # reference dataset layout: root u/v/p shaped (ny, nx), time attr on /p
    with h5py.File(out / "0000010.h5") as fh:
        assert fh["u"].shape == (16, 15)
        assert fh["v"].shape == (15, 16)
        assert fh["p"].shape == (16, 16)
        assert abs(fh["p"].attrs["time"] - 0.1) < 1e-12
        # restart extras present (nrestart=10)
        assert "convection/0" in fh and "diffusion/0" in fh
    with h5py.File(out / "grid.h5") as fh:
        assert set(fh.keys()) == {"u", "v", "p", "vertex"}
        assert fh["u/x"].shape == (15,)
        assert fh["vertex/y"].shape == (17,)
    # iteration log: ite, vIters, vRes, pIters, pRes
    lines = (out / "iterations-0.txt").read_text().strip().splitlines()
    assert len(lines) == 10
    assert len(lines[0].split("\t")) == 5


def test_cavity_divergence_free(tmp_path):
    cfg = run_config(tmp_path, nt=10)
    solver = NavierStokesSolver(cfg)
    solver.run()
    div = make_divergence(solver.mesh, solver.bc, solver.dtype)
    d = div(solver.state["q"], solver.state["bc"])
    # atol 1e-6 on the Poisson solve -> divergence residual at that scale
    assert float(jnp.max(jnp.abs(d))) < 1e-5
    solver.close()


def test_restart_exact(tmp_path):
    # continuous 20-step run
    cfg = run_config(tmp_path / "cont", nt=20)
    ref = NavierStokesSolver(cfg)
    ref.run()
    ref.close()
    # 10 steps, restart, 10 more
    cfg1 = run_config(tmp_path / "split", nt=10)
    s1 = NavierStokesSolver(cfg1)
    s1.run()
    s1.close()
    cfg2 = run_config(tmp_path / "split", nt=10, start_step=10)
    s2 = NavierStokesSolver(cfg2)
    s2.run()
    s2.close()
    with h5py.File(tmp_path / "cont" / "output" / "0000020.h5") as fa, \
         h5py.File(tmp_path / "split" / "output" / "0000020.h5") as fb:
        for name in ("u", "v", "p"):
            a, b = np.asarray(fa[name]), np.asarray(fb[name])
            # identical up to solver tolerance (reference: exact restart,
            # SURVEY.md §3.4); histories are restored bit-for-bit, the
            # Krylov solves reconverge to the same tolerance
            np.testing.assert_allclose(a, b, atol=2e-6)


@pytest.mark.slow
def test_cavity_ghia_validation(tmp_path):
    """1000 steps at 32^2 vs Ghia et al. 1982 centerline u-velocity
    (reference: examples/navierstokes/liddrivencavity2dRe100)."""
    cfg = run_config(tmp_path, nt=1000, nsave=1000, nrestart=1000, n=32)
    solver = NavierStokesSolver(cfg)
    solver.run()
    ghia_y = np.array([0.0547, 0.1719, 0.2813, 0.4531, 0.5,
                       0.6172, 0.7344, 0.8516, 0.9531])
    ghia_u = np.array([-0.04192, -0.10150, -0.15662, -0.21090, -0.20581,
                       -0.13641, 0.00332, 0.23151, 0.68717])
    u = np.asarray(solver.state["q"]["u"])
    xu = solver.mesh.coord(0, 0)
    yu = solver.mesh.coord(0, 1)
    icl = int(np.argmin(np.abs(xu - 0.5)))
    interp = np.interp(ghia_y, yu, u[:, icl])
    # 32^2 discretization accuracy (near-lid point excluded: boundary layer
    # under-resolved at this grid, same as the reference at 32^2)
    np.testing.assert_allclose(interp, ghia_u, atol=6e-3)
    solver.close()


def test_solver_divergence_aborts(tmp_path):
    """A solve that exhausts max_it without reaching tolerance must raise
    SolverDivergedError naming the solver (reference parity:
    linsolverksp.cpp:96-104 SETERRQs on KSPConvergedReason < 0)."""
    from petibm_tpu.linalg import SolverDivergedError

    cfg = run_config(tmp_path, nt=2, nsave=2)
    cfg["parameters"]["poissonSolver"] = {
        "type": "CPU", "atol": 1e-300, "rtol": 0.0, "max_it": 1}
    solver = NavierStokesSolver(cfg)
    with pytest.raises(SolverDivergedError, match="poisson"):
        solver.run()
    # crash-safe logs: the per-step records up to the abort are on disk
    lines = (tmp_path / "output" / "iterations-0.txt").read_text()
    assert lines.strip()
    solver.close()


def test_solver_divergence_warn_policy(tmp_path, capsys):
    cfg = run_config(tmp_path, nt=2, nsave=2)
    cfg["parameters"]["divergence"] = "warn"
    cfg["parameters"]["poissonSolver"] = {
        "type": "CPU", "atol": 1e-300, "rtol": 0.0, "max_it": 1}
    solver = NavierStokesSolver(cfg)
    solver.run()  # must not raise
    solver.close()
    assert "diverged" in capsys.readouterr().err


def test_explicit_pc_choice_wins_over_fdm_default(tmp_path):
    """An EXPLICIT velocitySolver pc (inline or options file) disables the
    FDM direct momentum solve; the role's implicit jacobi default does
    not (config.solver_config pc_explicit semantics)."""
    import os as _os

    from petibm_tpu.linalg.fdm import make_fdm_solver  # noqa: F401

    cfg_default = run_config(tmp_path / "a", nt=1)
    _os.makedirs(tmp_path / "a", exist_ok=True)
    sa = NavierStokesSolver(cfg_default)
    # default (implicit jacobi role default): direct FDM momentum solver
    assert getattr(sa.v_solver, "__qualname__",
                   "").startswith("make_fdm_solver")
    sa.close()

    cfg_explicit = run_config(tmp_path / "b", nt=1)
    _os.makedirs(tmp_path / "b", exist_ok=True)
    cfg_explicit["parameters"]["velocitySolver"] = {"type": "CPU",
                                                    "pc": "jacobi"}
    sb = NavierStokesSolver(cfg_explicit)
    assert not getattr(sb.v_solver, "__qualname__",
                       "").startswith("make_fdm_solver")
    sb.close()


def test_bn_order2_end_to_end(tmp_path):
    """BN: 2 exercises the non-separable pressure path (MG-preconditioned
    CG — FDM is BN=1-only) end-to-end; the solution differs from BN=1
    only by the higher-order splitting correction."""
    import os as _os

    _os.makedirs(tmp_path / "a", exist_ok=True)
    _os.makedirs(tmp_path / "b", exist_ok=True)
    cfg1 = run_config(tmp_path / "a", nt=5)
    cfg2 = run_config(tmp_path / "b", nt=5)
    cfg2["parameters"]["BN"] = 2
    s1 = NavierStokesSolver(cfg1)
    s2 = NavierStokesSolver(cfg2)
    assert getattr(s1, "poisson_fdm", None) is not None
    assert getattr(s2, "poisson_fdm", None) is None  # MG-CG path
    import jax

    for _ in range(5):
        s1.state, st1 = s1._step_fn(s1.state)
        s2.state, st2 = s2._step_fn(s2.state)
    st2 = jax.device_get(st2)
    assert bool(st2["p_ok"]) and bool(st2["v_ok"])
    # O(dt^2) vs O(dt^3) splitting: fields agree to the splitting error
    np.testing.assert_allclose(np.asarray(s2.state["q"]["u"]),
                               np.asarray(s1.state["q"]["u"]), atol=5e-3)
    s1.close(), s2.close()


def test_pinned_pressure_backend_matches_mean_projection(tmp_path):
    """poissonSolver type: GPU selects the reference's AmgX-style pinned
    pressure (MatZeroRowsColumns on row 0, navierstokes.cpp:414-420)
    instead of the nullspace mean projection: velocities must agree and
    pressures differ only by a constant."""
    import os as _os

    import jax

    _os.makedirs(tmp_path / "a", exist_ok=True)
    _os.makedirs(tmp_path / "b", exist_ok=True)
    cfg1 = run_config(tmp_path / "a", nt=5)
    cfg2 = run_config(tmp_path / "b", nt=5)
    cfg2["parameters"]["poissonSolver"] = {"type": "GPU", "atol": 1e-11,
                                           "rtol": 0.0}
    cfg1["parameters"]["poissonSolver"] = {"type": "CPU", "atol": 1e-11,
                                           "rtol": 0.0}
    s1 = NavierStokesSolver(cfg1)
    s2 = NavierStokesSolver(cfg2)
    assert not s1.is_ref_p and s2.is_ref_p
    assert getattr(s2, "poisson_fdm", None) is None  # pinned -> MG-CG
    for _ in range(5):
        s1.state, st1 = s1._step_fn(s1.state)
        s2.state, st2 = s2._step_fn(s2.state)
    st2 = jax.device_get(st2)
    assert bool(st2["p_ok"]) and bool(st2["v_ok"])
    np.testing.assert_allclose(np.asarray(s2.state["q"]["u"]),
                               np.asarray(s1.state["q"]["u"]), atol=1e-7)
    p1, p2 = np.asarray(s1.state["p"]), np.asarray(s2.state["p"])
    np.testing.assert_allclose(p2 - p2.mean(), p1 - p1.mean(), atol=1e-7)
    s1.close(), s2.close()
