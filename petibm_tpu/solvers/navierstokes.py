"""Projection-method incompressible Navier-Stokes solver.

TPU-native re-design of the reference's NavierStokesSolver application
(reference: applications/navierstokes/navierstokes.{h,cpp}).  The whole
time step — RHS assembly, BiCGStab momentum solve, CG Poisson solve,
projection, pressure update, ghost refresh — is one jitted function over a
state pytree; PETSc Mats become stencil closures, KSP becomes the native
Krylov module, and the packed velocity Vec becomes the ``{u, v, w}`` dict.

Scheme (Perot 1993 fractional step, navierstokes.cpp:240-266):
  1. rhs1 = -G p + u/dt + sum_k conv-coef_k * (-N u)_k
           + sum_k diff-coef_k * nu (L+Lbc) u_k + a_imp * nu Lbc u   (:432-521)
  2. solve (I/dt - a_imp nu L) u* = rhs1                              (:524)
  3. rhs2 = (D + Dbc) u*                                              (:540-563)
  4. solve D B_N G dp = rhs2                                          (:566)
  5. u = u* - B_N G dp ; p += dp                                      (:583-615)
  6. refresh ghost values                                             (:263)
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import io as pio
from ..boundary import BoundarySet
from ..config import solver_config
from ..ics import initial_fields
from ..linalg import extract_diagonal, make_solver
from ..mesh import StaggeredMesh
from ..operators import (
    make_bn,
    make_convection,
    make_divergence,
    make_gradient,
    make_laplacian,
)
from ..timeintegration import create_time_integration
from ..types import Field
from ..utils.timers import StageTimers

tmap = jax.tree_util.tree_map

VEL_NAMES = ("u", "v", "w")


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class NavierStokesSolver:
    """The projection-method driver (library-composable, like the reference's
    class reused by IBPM/decoupled-IBPM through inheritance)."""

    def __init__(self, config: dict):
        self.config = config
        self.timers = StageTimers()
        with self.timers.stage("initialize"):
            self._init(config)

    # ------------------------------------------------------------------
    def _init(self, config: dict) -> None:
        params = config.get("parameters", {})
        self.dt = float(params["dt"])
        self.nstart = int(params.get("startStep", 0))
        self.ite = self.nstart
        self.t = float(params.get("t", 0.0))
        self.nt = int(params.get("nt", 1))
        self.nsave = int(params.get("nsave", self.nt))
        self.nrestart = int(params.get("nrestart", self.nt))
        self.nu = float(config["flow"]["nu"])
        dtype_name = params.get("dtype")
        self.dtype = jnp.dtype(dtype_name) if dtype_name else _default_dtype()

        self.mesh = StaggeredMesh(config)
        self.output_dir = config.get("output", os.getcwd())
        self.logs_dir = config.get("logs", self.output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        os.makedirs(self.logs_dir, exist_ok=True)
        pio.write_grid(self.mesh, os.path.join(self.output_dir, "grid.h5"))

        self.bc = BoundarySet(self.mesh, config)

        # initial conditions (solutionsimple.cpp:122-228)
        fields0 = initial_fields(config, self.mesh, t=self.t)
        self.q = {VEL_NAMES[c]: jnp.asarray(fields0[VEL_NAMES[c]], self.dtype)
                  for c in range(self.mesh.dim)}
        self.p = jnp.asarray(fields0["p"], self.dtype)
        self.bcstate = self.bc.init_state(self.q, self.dtype)

        self.conv_ti = create_time_integration("convection", config)
        self.diff_ti = create_time_integration("diffusion", config)
        zero_q = tmap(jnp.zeros_like, self.q)
        self.conv = tuple(zero_q for _ in range(self.conv_ti.n_explicit))
        self.diff = tuple(zero_q for _ in range(self.diff_ti.n_explicit))

        self._create_operators(config)
        self._create_solvers(config)
        self._step_fn = jax.jit(self._build_step())

        self.iter_log_path = os.path.join(
            self.output_dir, f"iterations-{self.ite}.txt")
        self._iter_log = open(self.iter_log_path, "w")
        self._last_stats = None

    # ------------------------------------------------------------------
    def _create_operators(self, config: dict) -> None:
        """Stencil closures replacing createOperators
        (navierstokes.cpp:317-365)."""
        mesh, bc, dtype = self.mesh, self.bc, self.dtype
        self.grad = make_gradient(mesh, dtype)
        self.div = make_divergence(mesh, bc, dtype)
        self.lap = make_laplacian(mesh, bc, dtype)
        self.convect = make_convection(mesh, bc, dtype)
        self.bn_order = int(config.get("parameters", {}).get("BN", 1))
        self.bn = make_bn(self.lap, self.dt,
                          self.diff_ti.implicit_coeff * self.nu, self.bn_order)

        dt, nu, cimp = self.dt, self.nu, self.diff_ti.implicit_coeff

        def A_momentum(u):
            lu = self.lap(u, None, homogeneous=True)
            return tmap(lambda a, b: a / dt - cimp * nu * b, u, lu)

        def A_poisson(phi):
            return self.div(self.bn(self.grad(phi)), None, homogeneous=True)

        self.A_momentum = A_momentum
        self.A_poisson = A_poisson

    def _create_solvers(self, config: dict) -> None:
        """Krylov solvers + nullspace handling replacing createLinSolver and
        setNullSpace (navierstokes.cpp:150-154, 395-429)."""
        vopts = solver_config(config, "velocity")
        popts = solver_config(config, "poisson")
        mesh, dtype = self.mesh, self.dtype

        # Jacobi preconditioners from probed exact diagonals
        diag_mom = extract_diagonal(
            self.A_momentum, tmap(jnp.zeros_like, self.q), radius=1)
        M_mom = ((lambda r: tmap(lambda a, b: a / b, r, diag_mom))
                 if vopts.get("pc") != "none" else None)

        # pinned pressure (AmgX path) vs mean-projection (KSP path)
        self.is_ref_p = popts.get("backend") == "GPU"
        if self.is_ref_p:
            # MatZeroRowsColumns on row/col 0 with unit diagonal
            # (navierstokes.cpp:414-420)
            def A_p(phi):
                flat = phi.reshape(-1)
                phi0 = flat.at[0].set(0.0).reshape(phi.shape)
                y = self.A_poisson(phi0).reshape(-1)
                y = y.at[0].set(flat[0])
                return y.reshape(phi.shape)
        else:
            A_p = self.A_poisson

        # CG wants SPD; D Bn G is symmetric negative semidefinite -> negate
        def negA_p(phi):
            return -A_p(phi)

        self._negA_p = negA_p
        diag_p = extract_diagonal(
            negA_p, jnp.zeros(mesh.shape(Field.P), dtype),
            radius=self.bn_order)
        M_p = ((lambda r: r / diag_p) if popts.get("pc") != "none" else None)

        self.v_solver = make_solver(self.A_momentum, vopts, M=M_mom)
        self.p_solver = make_solver(negA_p, popts, M=M_p)
        self.warm_start = bool(
            config.get("parameters", {}).get("warmStart", False))

    # ------------------------------------------------------------------
    def _build_step(self):
        """One time step as a pure function (advance, navierstokes.cpp:240)."""
        dt, nu = self.dt, self.nu
        conv_coeffs = self.conv_ti.explicit_coeffs
        diff_coeffs = self.diff_ti.explicit_coeffs
        cimp = self.diff_ti.implicit_coeff
        bc, grad, div, lap, convect, bn = (
            self.bc, self.grad, self.div, self.lap, self.convect, self.bn)
        warm = self.warm_start
        is_ref_p = self.is_ref_p

        def step(q, p, bcstate, conv, diff):
            # ---- assembleRHSVelocity (navierstokes.cpp:432-521) ----
            gp = grad(p)
            rhs1 = tmap(lambda u, g: u / dt - g, q, gp)
            if conv_coeffs:
                conv = (tmap(lambda x: -x, convect(q, bcstate)),) + conv[:-1]
                for c, h in zip(conv_coeffs, conv):
                    rhs1 = tmap(lambda r, x: r + c * x, rhs1, h)
            if diff_coeffs:
                diff = (tmap(lambda x: nu * x, lap(q, bcstate)),) + diff[:-1]
                for c, h in zip(diff_coeffs, diff):
                    rhs1 = tmap(lambda r, x: r + c * x, rhs1, h)
            # implicit BC correction: update a1, add a_imp * nu * Lbc u
            bcstate = bc.update_eqs(bcstate, q, dt)
            if cimp != 0.0:
                lfull = lap(q, bcstate)
                lhom = lap(q, None, homogeneous=True)
                rhs1 = tmap(lambda r, a, b: r + cimp * nu * (a - b),
                            rhs1, lfull, lhom)

            # ---- solveVelocity (:524-537) ----
            x0 = q if warm else tmap(jnp.zeros_like, q)
            vsol = self.v_solver(rhs1, x0)
            ustar = vsol.x

            # ---- assembleRHSPoisson (:540-563) ----
            rhs2 = div(ustar, bcstate)
            if is_ref_p:
                flat = rhs2.reshape(-1).at[0].set(0.0)
                rhs2 = flat.reshape(rhs2.shape)
            else:
                rhs2 = rhs2 - jnp.mean(rhs2)  # nullspace-consistent RHS

            # ---- solvePoisson (:566-580) ----
            psol = self.p_solver(-rhs2, jnp.zeros_like(p))
            dP = psol.x
            if not is_ref_p:
                dP = dP - jnp.mean(dP)

            # ---- projection + pressure update (:583-615) ----
            qnew = tmap(lambda u, g: u - g, ustar, bn(grad(dP)))
            pnew = p + dP

            # ---- ghost refresh (:263) ----
            bcstate = bc.update_ghost_values(bcstate, qnew)

            stats = {"v_iters": vsol.iters, "v_res": vsol.residual,
                     "p_iters": psol.iters, "p_res": psol.residual}
            return qnew, pnew, bcstate, conv, diff, stats

        return step

    # ------------------------------------------------------------------
    def advance(self) -> None:
        self.t += self.dt
        self.ite += 1
        with self.timers.stage("step"):
            (self.q, self.p, self.bcstate, self.conv, self.diff,
             self._last_stats) = self._step_fn(
                self.q, self.p, self.bcstate, self.conv, self.diff)

    def finished(self) -> bool:
        return self.ite >= self.nstart + self.nt

    # ------------------------------------------------------------------
    def _solution_fields(self) -> dict:
        out = {VEL_NAMES[c]: self.q[VEL_NAMES[c]] for c in range(self.mesh.dim)}
        out["p"] = self.p
        return out

    def _snapshot_path(self) -> str:
        return os.path.join(self.output_dir, f"{self.ite:07d}.h5")

    def io_initial_data(self) -> None:
        """Write step-0 snapshot or read restart data
        (navierstokes.cpp:207-237)."""
        if self.ite == 0:
            self.write_solution_hdf5(self._snapshot_path())
        else:
            self.read_restart_data_hdf5(self._snapshot_path())

    def write_solution_hdf5(self, path: str) -> None:
        pio.write_solution(path, jax.block_until_ready(self._solution_fields()))
        pio.write_time(path, self.t)

    def write_restart_data_hdf5(self, path: str) -> None:
        if not os.path.isfile(path):
            self.write_solution_hdf5(path)
        pio.write_restart_histories(
            path, self.mesh.dim, [jax.block_until_ready(h) for h in self.conv],
            [jax.block_until_ready(h) for h in self.diff],
            extra=self._restart_extra())

    def _restart_extra(self) -> dict:
        return {}

    def read_restart_data_hdf5(self, path: str) -> None:
        names = [VEL_NAMES[c] for c in range(self.mesh.dim)] + ["p"]
        data = pio.read_solution(path, names)
        self.q = {n: jnp.asarray(data[n], self.dtype)
                  for n in names if n != "p"}
        self.p = jnp.asarray(data["p"], self.dtype)
        self.t = pio.read_time(path)
        shapes = {VEL_NAMES[c]: self.mesh.shape(Field(c))
                  for c in range(self.mesh.dim)}
        conv, diff, extra = pio.read_restart_histories(
            path, self.mesh.dim, shapes, len(self.conv), len(self.diff),
            extra_names=tuple(self._restart_extra()))
        self.conv = tuple(
            {k: jnp.asarray(v, self.dtype) for k, v in h.items()} for h in conv)
        self.diff = tuple(
            {k: jnp.asarray(v, self.dtype) for k, v in h.items()} for h in diff)
        self._read_restart_extra(extra)
        # TODO(reference parity): like the reference (navierstokes.cpp:742),
        # convective-BC ghost state is re-initialized, not restored exactly.
        self.bcstate = self.bc.init_state(self.q, self.dtype)

    def _read_restart_extra(self, extra: dict) -> None:
        pass

    # ------------------------------------------------------------------
    def write(self) -> None:
        """Per-step outputs (write, navierstokes.cpp:269-308)."""
        with self.timers.stage("write"):
            self.write_lin_solvers_info()
            if self.ite % self.nsave == 0:
                self.write_solution_hdf5(self._snapshot_path())
                self.timers.dump(os.path.join(self.logs_dir,
                                              f"{self.ite:07d}.log"))
            if self.ite % self.nrestart == 0:
                self.write_restart_data_hdf5(self._snapshot_path())
        self.monitor_probes()

    def write_lin_solvers_info(self) -> None:
        """iterations-<start>.txt lines (navierstokes.cpp:766-794)."""
        s = self._last_stats
        if s is None:
            return
        self._iter_log.write(
            f"{self.ite}\t{int(s['v_iters'])}\t{float(s['v_res']):e}\t"
            f"{int(s['p_iters'])}\t{float(s['p_res']):e}\n")
        self._iter_log.flush()

    def monitor_probes(self) -> None:
        pass  # probes attach here (added with the probes subsystem)

    # ------------------------------------------------------------------
    def run(self) -> None:
        """main-loop convenience (applications/navierstokes/main.cpp:45-78)."""
        self.io_initial_data()
        while not self.finished():
            self.advance()
            self.write()

    def close(self) -> None:
        if self._iter_log and not self._iter_log.closed:
            self._iter_log.close()
