"""Benchmark: decoupled-IBPM cylinder Re=200 on a 450x450 stretched grid.

This is BASELINE.json's headline configuration ("2D cylinder Re=200 on
stretched Cartesian grid").  Baseline anchor (BASELINE.md): the reference's
closest published number — 2D IBPM cylinder Re=550, 450x450 stretched,
1200 steps in < 5 min on 2 MPI ranks + 1 NVIDIA K40
(doc/markdowns/examples2d.md:133) — i.e. 250 ms per time step.

The full step (direct fast-diagonalization momentum and pressure solves
with warm-started recurrence-residual refinement at the reference's
atol 1e-6, setup-time-inverted dense EBNH force solve, projection) runs
jitted on one TPU chip, 1000 steps per dispatch
(parameters.stepsPerDispatch — lax.scan inside one XLA program; per-step
solver stats still ride along, so per-step logging is preserved).  The
~28 ms tunnel round trip per sync would otherwise dominate a ~0.15 ms
step: at 50-step chunks the report overstates the step by ~0.56 ms
(measured; validation/stages_450sq.txt has the per-phase device times).
Measurement happens after a 1000-step spin-up so Krylov iteration counts
reflect developed flow, not the trivial uniform start.
Prints ONE JSON line; vs_baseline > 1 means faster than the reference's
rate.
"""

import json
import math
import os
import sys
import tempfile
import time


def make_body(tmpdir: str, ds: float = 0.02) -> str:
    n = int(round(2 * math.pi * 0.5 / ds))
    path = os.path.join(tmpdir, "circle.body")
    with open(path, "w") as fh:
        fh.write(f"{n}\n")
        for k in range(n):
            th = 2 * math.pi * k / n
            fh.write(f"{0.5 * math.cos(th):10.8e}\t{0.5 * math.sin(th):10.8e}\n")
    return path


def build_config(tmpdir: str) -> dict:
    axes = []
    for d in ("x", "y"):
        axes.append({
            "direction": d, "start": -15.0,
            "subDomains": [
                {"end": -0.6, "cells": 120, "stretchRatio": 0.975},
                {"end": 0.6, "cells": 120, "stretchRatio": 1.0},
                {"end": 15.0, "cells": 210, "stretchRatio": 1.02},
            ],
        })
    return {
        "directory": tmpdir,
        "output": os.path.join(tmpdir, "output"),
        "logs": os.path.join(tmpdir, "logs"),
        "mesh": axes,
        "flow": {
            "nu": 0.005,  # Re = 200 on D = 1, U = 1
            "initialVelocity": [1.0, 0.0],
            "boundaryConditions": [
                {"location": "xMinus", "u": ["DIRICHLET", 1.0], "v": ["DIRICHLET", 0.0]},
                {"location": "xPlus", "u": ["CONVECTIVE", 1.0], "v": ["CONVECTIVE", 1.0]},
                {"location": "yMinus", "u": ["DIRICHLET", 1.0], "v": ["DIRICHLET", 0.0]},
                {"location": "yPlus", "u": ["DIRICHLET", 1.0], "v": ["DIRICHLET", 0.0]},
            ],
        },
        "parameters": {
            # dt follows the reference's 450^2 cylinder cases (Re550 uses
            # 0.0025 on this grid; explicit AB2 convection needs CFL < ~0.5)
            "dt": 0.0025, "nt": 10, "nsave": 100000, "nrestart": 100000,
            "dtype": "float32", "stepsPerDispatch": 1000,
            "convection": "ADAMS_BASHFORTH_2", "diffusion": "CRANK_NICOLSON",
            "velocitySolver": {"type": "CPU", "atol": 1e-6, "rtol": 1e-6,
                               "max_it": 1000},
            "poissonSolver": {"type": "CPU", "atol": 1e-6, "rtol": 1e-6,
                              "max_it": 5000},
            "forcesSolver": {"type": "CPU", "atol": 1e-6, "rtol": 1e-6,
                             "max_it": 1000},
        },
        "bodies": [{"type": "points", "file": make_body(tmpdir)}],
    }


def main() -> int:
    import jax

    from petibm_tpu.solvers.decoupledibpm import DecoupledIBPMSolver

    tmpdir = tempfile.mkdtemp(prefix="petibm_tpu_bench_")
    solver = DecoupledIBPMSolver(build_config(tmpdir))

    def sync(stats):
        """Honest barrier: materialize a scalar that depends on the whole
        chunk.  Over the tunneled device, block_until_ready acks before
        execution finishes; a device_get is the only true sync."""
        return float(jax.device_get(stats["p_res"])[-1])

    k = solver.steps_per_dispatch
    warmup_chunks, chunks = 1, 2  # 1000 spin-up steps, 2000 measured
    state = solver.state
    for _ in range(warmup_chunks):
        state, stats = solver._chunk_fn(state)
    sync(stats)

    t0 = time.perf_counter()
    for _ in range(chunks):
        state, stats = solver._chunk_fn(state)
        sync(stats)
    elapsed = time.perf_counter() - t0
    iters = chunks * k
    # stats are stacked (k,) per chunk; report the last step's
    stats = {key: v[-1] for key, v in jax.device_get(stats).items()}

    ms_per_step = elapsed / iters * 1e3
    baseline_ms = 250.0  # reference: 1200 steps < 5 min (2 MPI + K40)

    # --- north-star metrics (BASELINE.json): SpMV nnz/s on the solver's
    # own fused Poisson apply, and the step's HBM-bandwidth utilization ---
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.bench_spmv import _time_chain, stream_bw_bytes_per_s

    bw = stream_bw_bytes_per_s()  # measured stream roofline, B/s
    phi = state["p"]
    # marginal per-apply cost from the chain slope (K=16 vs 256): the
    # ~1 ms per-program dispatch overhead over the tunneled chip
    # otherwise dominates a ~1.4 us apply (round-5 decomposition,
    # validation/perf_spmv.jsonl chain entries)
    fn = jax.jit(solver._negA_p)
    # K spread wide enough that the slope dwarfs the ~0.5 ms relay
    # jitter on each program's timing (2048 applies ~ 3 ms of work)
    t_lo = _time_chain(fn, phi, 64, target_s=1.0)
    t_hi = _time_chain(fn, phi, 2048, target_s=2.0)
    t_apply = max((t_hi - t_lo) / (2048 - 64), 1e-9)
    t_program_overhead = max(t_lo - 64 * t_apply, 0.0)
    ncells = int(phi.size)
    nnz = 5 * ncells  # 5-point pressure Poisson rows
    # mandatory traffic: phi + out only — both the separable Pallas
    # kernel and the fused-XLA stencil stream exactly these two arrays
    # (coefficients are fused 1D factors, linalg/mg.py); kernels tag
    # .traffic_arrays should a different-traffic formulation ever return
    n_arrays = int(getattr(solver._negA_p, "traffic_arrays", 2))
    mand_bytes = n_arrays * ncells * 4
    sol_nnz_s = bw * nnz / mand_bytes
    nnz_per_s = nnz / t_apply

    # HBM utilization of the hot operator: mandatory traffic over
    # measured apply time, as a fraction of the measured stream bandwidth
    # (at 450^2 the apply is fixed-cost-bound, not bandwidth-bound — see
    # scripts/bench_spmv.py for the sizes where the roofline binds)
    hbm_util = mand_bytes / t_apply / bw
    # whole-step bytes from XLA's cost model — a LOWER bound only: while
    # loop bodies (the Krylov/V-cycle iterations) are counted once
    step_util_lb = None
    try:
        cost = solver._chunk_fn.lower(state).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        chunk_bytes = float(cost.get("bytes accessed", 0.0))
        if chunk_bytes > 0:
            step_util_lb = (chunk_bytes / k) / (ms_per_step / 1e3) / bw
    except Exception:
        pass
    result = {
        "metric": "decoupled_ibpm_cylinder_re200_450sq_step_ms",
        "value": round(ms_per_step, 3),
        "unit": "ms/step",
        "vs_baseline": round(baseline_ms / ms_per_step, 3),
        "detail": {
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "dtype": "float32",
            "grid": "450x450 stretched, 157 body points",
            "v_iters": int(stats["v_iters"]),
            "p_iters": int(stats["p_iters"]),
            "f_iters": int(stats["f_iters"]),
            "p_res": float(stats["p_res"]),
            "steps_per_dispatch": k,
            "measured_after_steps": warmup_chunks * k,
            # north-star: fused -D B1 G apply (the CG hot loop operator)
            "nnz_per_s": round(nnz_per_s, 0),
            "spmv_gnnz_per_s": round(nnz_per_s / 1e9, 3),
            "spmv_vs_roofline": round(nnz_per_s / sol_nnz_s, 3),
            "spmv_ms_per_apply": round(t_apply * 1e3, 4),
            "spmv_ms_program_overhead": round(t_program_overhead * 1e3, 3),
            "spmv_note": "marginal per-apply (K=64..2048 chain slope); "
                         ">1.0 roofline = VMEM-resident working set",
            "stream_GBps": round(bw / 1e9, 1),
            "traffic_model_arrays": n_arrays,
            "hbm_bw_utilization": round(hbm_util, 3),
            "step_hbm_utilization_xla_cost_model_lb": (
                round(step_util_lb, 4) if step_util_lb is not None else None),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
