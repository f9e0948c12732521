"""Decoupled immersed-boundary projection method (Li et al. 2016).

TPU-native re-design of the reference's DecoupledIBPMSolver
(reference: applications/decoupledibpm/decoupledibpm.{h,cpp}).  Extends the
projection step with a Lagrangian force solve:

  1. rhs1 = NS rhs + H f                       (:233-250)
  2. solve momentum -> u*
  3. rhsf = -E u*          (+ UB for moving bodies, rigidkinematics)
  4. solve (E B_N H) df = rhsf                 (:253-285)
  5. u** = u* + B_N H df   (applyNoSlip, :288-299)
  6. Poisson / projection / pressure update as in NS
  7. f += df               (updateForces, :302-316)

E/H are the delta-window gather/scatter (ibm.interp.DeltaOp); EBNH is
applied matrix-free (E ∘ B_N ∘ H), solved with a Krylov method — no
SpGEMM-materialized small matrix, so moving bodies need no re-assembly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import solver_config
from ..ibm.body import BodyPack
from ..ibm.interp import make_delta_op
from ..linalg import make_solver
from ._forceslog import ForcesLogMixin
from .navierstokes import NavierStokesSolver

tmap = jax.tree_util.tree_map


class DecoupledIBPMSolver(ForcesLogMixin, NavierStokesSolver):
    #: True when body coordinates change per step (rigidkinematics): the
    #: dense EBNH blocks must then be rebuilt inside the jitted step
    _moving_bodies = False

    def _extra_init(self, config: dict) -> None:
        self.bodies = BodyPack(config, self.mesh)
        if self.bodies.n_bodies == 0:
            raise ValueError("decoupled IBPM requires at least one body")
        params = config.get("parameters", {})
        kernel = params.get("delta", "ROMA_ET_AL_1999")
        # large bodies switch to the windowed gather/scatter delta engine
        # (parameters.deltaEngine: auto|factor|windowed; ibm/interp.py)
        self.delta = make_delta_op(
            self.mesh, kernel, self.dtype, n_pts=self.bodies.n_pts,
            engine=params.get("deltaEngine", "auto"))
        self.state["f"] = jnp.zeros((self.bodies.n_pts, self.mesh.dim),
                                    self.dtype)
        self.state["df"] = jnp.zeros_like(self.state["f"])
        # stationary bodies: windows are concrete arrays computed once
        # (moving bodies recompute inside the step, see rigidkinematics)
        self._static_windows = self.delta.windows(
            jnp.asarray(self.bodies.all_coords(), self.dtype))

        fopts = solver_config(config, "forces")
        self._make_force_solver(fopts)

    def _make_force_solver(self, fopts: dict) -> None:
        delta, bn = self.delta, self.bn

        def ebnh(df, win):
            return delta.interpolate(bn(delta.spread(df, win)), win)

        self._ebnh = ebnh
        self._fopts = fopts

        # For BN order 1, B_N = dt*I exactly, so EBNH = dt * E H is
        # block-diagonal over velocity components with per-component
        # (N, N) blocks prod_d (S_vol,d @ S_delta,d^T) — a few small MXU
        # matmuls from the window factor matrices.  A direct dense solve
        # replaces the Krylov iteration (observed 100+ iterations on the
        # 3D sphere, each sweeping the full grid through spread/
        # interpolate).  The reference instead materializes sparse EBNH
        # via SpGEMM and iterates (decoupledibpm.cpp:171-216).  Opt out
        # with parameters.forcesSolver.dense: false.
        # the windowed delta engine keeps no per-grid-axis factor matrices,
        # so the dense EBNH blocks can't be formed (and at that body size a
        # dense (N, N) solve is infeasible anyway) — use matrix-free Krylov
        dense = bool(fopts.get(
            "dense", self.bn_order == 1 and not self.delta.windowed))
        if dense and self.bn_order == 1 and not self.delta.windowed:
            from ..ibm.interp import dense_ebnh_blocks
            from ..linalg.krylov import SolveResult

            dt, dim, dtype = self.dt, self.mesh.dim, self.dtype
            atol = float(fopts.get("atol", 1e-6))
            rtol = float(fopts.get("rtol", 0.0))

            def dense_blocks(win):
                return dense_ebnh_blocks(win, dim, dt, dtype)

            self._dense_ebnh_blocks = dense_blocks

            def _result(df, rhsf, mats, win):
                # report the full matrix-free residual as the diagnostic,
                # but judge convergence on the DENSE-block residual (the
                # small-matrix recurrence scale): the full grid-sweep
                # residual carries eps*||grid fields|| evaluation noise
                # (see linalg/fdm.py on f32 residual semantics), while a
                # singular/NaN block (e.g. coincident body points) still
                # fails the check and trips divergence: abort
                r_full = rhsf - ebnh(df, win)
                res = jnp.sqrt(jnp.sum(r_full * r_full))
                r_small = jnp.stack(
                    [rhsf[:, c] - mats[c] @ df[:, c] for c in range(dim)],
                    axis=1)
                rn = jnp.sqrt(jnp.sum(r_small * r_small))
                tol = jnp.maximum(atol, rtol * jnp.sqrt(
                    jnp.sum(rhsf * rhsf)))
                return SolveResult(x=df, iters=jnp.asarray(0, jnp.int32),
                                   residual=res, converged=rn <= tol)

            if not self._moving_bodies:
                # stationary bodies: the blocks are constant, so invert
                # them ONCE at setup (host numpy, f64) — the per-step
                # solve becomes (N, N) MXU matvecs: inverse apply +
                # recurrence-residual refinement against the f32 blocks
                # (make_fdm_solver: warm-started, stagnation-checked KSP
                # semantics).  A single fixed refinement pass was not
                # enough at 3D-sphere scale — N ~ 2000 points with block
                # cond ~ 450 floors the freshly-evaluated residual near
                # eps*kappa*||rhs|| ~ 1.5e-5, above atol 1e-6, which
                # aborted the run (latent round-4 regression caught by
                # the provenance re-validation; the recurrence-residual
                # loop converges because its arithmetic stays at the
                # correction scale — see linalg/fdm.py).  Sequential
                # paths (LU substitution) measure ~5x slower than matvec
                # form on TPU.  The reference re-assembles + re-solves
                # EBNH df = rhsf every step even for static bodies
                # (decoupledibpm.cpp:253-285); moving bodies keep the
                # warm-inverse path below (rigidkinematics).
                import numpy as np

                from ..linalg.fdm import make_fdm_solver

                mats = dense_blocks(self._static_windows)
                inv = [jnp.asarray(
                    np.linalg.inv(np.asarray(m, np.float64)), dtype)
                    for m in mats]

                class _InvBlocks:
                    @staticmethod
                    def solve(r):
                        return jnp.stack(
                            [inv[c] @ r[:, c] for c in range(dim)],
                            axis=1)

                def A_dense(df):
                    return jnp.stack(
                        [mats[c] @ df[:, c] for c in range(dim)], axis=1)

                refine = make_fdm_solver(_InvBlocks, A_dense, fopts)

                def solve_forces_static(rhsf, win, x0=None):
                    return refine(rhsf, jnp.zeros_like(rhsf)
                                  if x0 is None else x0)

                self._solve_forces = solve_forces_static
                return

            # moving bodies: warm-inverse refinement.  EBNH is built from
            # translation-covariant delta windows, so for rigid motion
            # within the (uniform) body region EBNH(t) differs from
            # EBNH(coords0) only by sub-cell phase — the setup-time
            # inverse at the reference coordinates remains a strong
            # preconditioner at ANY excursion, and 1-3 matrix-free
            # refinement passes (small matvec + one windowed E/H sweep
            # each) replace the per-step dense block build +
            # jnp.linalg.solve (which cost ~2x the rest of the step,
            # round-4 measurement in validation/oscillating.json).  A
            # lax.cond falls back to the dense direct solve whenever the
            # refinement exits above tolerance (e.g. deforming windows).
            import numpy as np

            from ..linalg.fdm import make_fdm_solver

            mats0 = dense_blocks(self._static_windows)
            inv0 = [jnp.asarray(
                np.linalg.inv(np.asarray(m, np.float64)), dtype)
                for m in mats0]

            class _Inv0:
                @staticmethod
                def solve(r):
                    return jnp.stack(
                        [inv0[c] @ r[:, c] for c in range(dim)], axis=1)

            def solve_forces(rhsf, win, x0=None):
                refine = make_fdm_solver(
                    _Inv0, lambda df: ebnh(df, win), fopts)
                res = refine(rhsf,
                             jnp.zeros_like(rhsf) if x0 is None else x0)

                def fallback(_):
                    mats = dense_blocks(win)
                    df = jnp.stack(
                        [jnp.linalg.solve(mats[c], rhsf[:, c])
                         for c in range(dim)], axis=1)
                    return _result(df, rhsf, mats, win)

                return jax.lax.cond(res.converged, lambda r: r, fallback,
                                    res)

            self._solve_forces = solve_forces
            return

        def solve_forces(rhsf, win, x0=None):
            solver = make_solver(lambda df: ebnh(df, win), fopts)
            return solver(rhsf, jnp.zeros_like(rhsf) if x0 is None else x0)

        self._solve_forces = solve_forces

    # ------------------------------------------------------------------
    def _pre_step(self, state):
        """Hook run at the top of the step (rigid-kinematics body motion)."""
        return state

    def _windows(self, state):
        """Current delta windows (static for stationary bodies)."""
        return self._static_windows

    def _body_velocity(self, state):
        """Lagrangian boundary velocity UB (zero for stationary bodies;
        reference: decoupledibpm rhsf = -E u**, rigidkinematics adds UB,
        rigidkinematics.cpp:143-159)."""
        return None

    def _build_step(self):
        def step(state):
            state = self._pre_step(state)
            win = self._windows(state)
            # momentum RHS + spread forces (decoupledibpm.cpp:245)
            rhs1, state = self._rhs_velocity(state)
            hf = self.delta.spread(state["f"], win)
            rhs1 = tmap(lambda r, x: r + x, rhs1, hf)
            vsol = self._solve_velocity(rhs1, state)
            ustar = vsol.x

            # force system (decoupledibpm.cpp:253-285)
            rhsf = -self.delta.interpolate(ustar, win)
            ub = self._body_velocity(state)
            if ub is not None:
                rhsf = rhsf + ub
            x0 = state["df"] if self.warm_start_poisson else None
            fsol = self._solve_forces(rhsf, win, x0)
            df = fsol.x

            # no-slip correction u** = u* + BN H df (decoupledibpm.cpp:288-299)
            ustar = tmap(lambda u, x: u + x, ustar,
                         self.bn(self.delta.spread(df, win)))

            qnew, pnew, dP, psol = self._poisson_project(ustar, state)
            bcstate = self.bc.update_ghost_values(state["bc"], qnew)
            fnew = state["f"] + df
            # forces ride along in the stats stream so chunked dispatches
            # (stepsPerDispatch > 1) still log them per step
            stats = {"v_iters": vsol.iters, "v_res": vsol.residual,
                     "v_ok": vsol.converged,
                     "p_iters": psol.iters, "p_res": psol.residual,
                     "p_ok": psol.converged,
                     "f_iters": fsol.iters, "f_res": fsol.residual,
                     "f_ok": fsol.converged,
                     "f": fnew}
            return dict(state, q=qnew, p=pnew, bc=bcstate, dP=dP, df=df,
                        f=fnew), stats

        return step

    # ------------------------------------------------------------------
    def _profile_phases(self):
        """Stage list with the IBM phases (reference log stages moveIB /
        rhsForces / solveForces, decoupledibpm.cpp:93-97,
        rigidkinematics.cpp:58)."""

        def moveIB(ctx):
            state = self._pre_step(ctx["state"])
            win = self._windows(state)
            probe = win[0]["sd"][0].ravel()[0]
            return dict(ctx, state=state, win=win), probe

        def rhsVelocity(ctx):
            rhs1, state = self._rhs_velocity(ctx["state"])
            hf = self.delta.spread(state["f"], ctx["win"])
            rhs1 = tmap(lambda r, x: r + x, rhs1, hf)
            return dict(ctx, state=state, rhs1=rhs1), rhs1["u"].ravel()[0]

        def solveVelocity(ctx):
            vsol = self._solve_velocity(ctx["rhs1"], ctx["state"])
            return dict(ctx, ustar=vsol.x), vsol.residual

        def rhsForces(ctx):
            rhsf = -self.delta.interpolate(ctx["ustar"], ctx["win"])
            ub = self._body_velocity(ctx["state"])
            if ub is not None:
                rhsf = rhsf + ub
            return dict(ctx, rhsf=rhsf), rhsf.ravel()[0]

        def solveForces(ctx):
            state = ctx["state"]
            x0 = state["df"] if self.warm_start_poisson else None
            fsol = self._solve_forces(ctx["rhsf"], ctx["win"], x0)
            return dict(ctx, df=fsol.x), fsol.residual

        def applyNoSlip(ctx):
            ustar = tmap(lambda u, x: u + x, ctx["ustar"],
                         self.bn(self.delta.spread(ctx["df"], ctx["win"])))
            return dict(ctx, ustar=ustar), ustar["u"].ravel()[0]

        def rhsPoisson(ctx):
            rhs2 = self._rhs_poisson(ctx["ustar"], ctx["state"])
            return dict(ctx, rhs2=rhs2), rhs2.ravel()[0]

        def solvePoisson(ctx):
            psol = self._solve_poisson(ctx["rhs2"], ctx["state"])
            return dict(ctx, dP=psol.x), psol.residual

        def update(ctx):
            state = ctx["state"]
            qnew, pnew, dP = self._project_update(ctx["ustar"], ctx["dP"],
                                                  state)
            bc = self.bc.update_ghost_values(state["bc"], qnew)
            fnew = state["f"] + ctx["df"]
            state = dict(state, q=qnew, p=pnew, dP=dP, bc=bc,
                         df=ctx["df"], f=fnew)
            return {"state": state}, pnew.ravel()[0]

        return [("moveIB", moveIB),
                ("rhsVelocity", rhsVelocity),
                ("solveVelocity", solveVelocity),
                ("rhsForces", rhsForces),
                ("solveForces", solveForces),
                ("applyNoSlip", applyNoSlip),
                ("rhsPoisson", rhsPoisson),
                ("solvePoisson", solvePoisson),
                ("update", update)]

    # ------------------------------------------------------------------
    def _iter_log_stats(self, s: dict):
        return super()._iter_log_stats(s) + [(s["f_iters"], s["f_res"])]

    def _restart_extra(self) -> dict:
        # df rides along because the force solve warm-starts from it
        # (bit-exact restarts depend on the warm start being identical,
        # like the base class's dP)
        return dict(super()._restart_extra(), force=self.state["f"],
                    dF=self.state["df"])

    def _read_restart_extra(self, extra: dict) -> None:
        super()._read_restart_extra(extra)
        if "force" in extra:
            self.state["f"] = jnp.asarray(
                extra["force"].reshape(self.bodies.n_pts, self.mesh.dim),
                self.dtype)
        if "dF" in extra:
            self.state["df"] = jnp.asarray(
                extra["dF"].reshape(self.bodies.n_pts, self.mesh.dim),
                self.dtype)

