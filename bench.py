"""Benchmark: full Navier-Stokes projection step on a 450x450 stretched grid.

Baseline anchor (BASELINE.md): the reference's 2D cylinder Re=550 case —
450x450 stretched grid, 1200 steps in < 5 min on 2 MPI ranks + 1 NVIDIA K40
(doc/markdowns/examples2d.md:133) — i.e. 250 ms per time step.  This bench
times the same-size external-flow problem (stretched three-zone mesh,
inlet/convective-outlet BCs, BiCGStab momentum + Jacobi-CG Poisson at the
reference's atol 1e-6 velocity / Poisson tolerances scaled to f32) on one
TPU chip and reports ms/step; vs_baseline > 1 means faster than the
reference's published rate.

Runs on whatever platform the environment provides (the driver supplies the
real TPU); prints ONE JSON line.
"""

import json
import os
import sys
import tempfile
import time


def build_config(tmpdir: str) -> dict:
    # three-zone stretched mesh like the reference cylinder cases
    # (examples/ibpm/cylinder2dRe40/config.yaml): uniform core, geometric
    # stretching outward; 450 cells per direction total
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
            "nu": 0.005,  # Re = 200 on D = 1
            "initialVelocity": [1.0, 0.0],
            "boundaryConditions": [
                {"location": "xMinus", "u": ["DIRICHLET", 1.0], "v": ["DIRICHLET", 0.0]},
                {"location": "xPlus", "u": ["CONVECTIVE", 1.0], "v": ["CONVECTIVE", 1.0]},
                {"location": "yMinus", "u": ["DIRICHLET", 1.0], "v": ["DIRICHLET", 0.0]},
                {"location": "yPlus", "u": ["DIRICHLET", 1.0], "v": ["DIRICHLET", 0.0]},
            ],
        },
        "parameters": {
            "dt": 0.01, "nt": 10, "nsave": 1000, "nrestart": 1000,
            "dtype": "float32",
            "convection": "ADAMS_BASHFORTH_2", "diffusion": "CRANK_NICOLSON",
            "velocitySolver": {"type": "CPU", "atol": 1e-6, "rtol": 1e-6,
                               "max_it": 1000},
            "poissonSolver": {"type": "CPU", "atol": 1e-6, "rtol": 1e-6,
                              "max_it": 20000},
        },
    }


def main() -> int:
    import jax

    from petibm_tpu.solvers.navierstokes import NavierStokesSolver

    tmpdir = tempfile.mkdtemp(prefix="petibm_tpu_bench_")
    solver = NavierStokesSolver(build_config(tmpdir))

    warmup, iters = 5, 30
    state = solver.state
    for _ in range(warmup):
        state, stats = solver._step_fn(state)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = solver._step_fn(state)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    ms_per_step = elapsed / iters * 1e3
    baseline_ms = 250.0  # reference: 1200 steps < 5 min (2 MPI + K40)
    result = {
        "metric": "ns_step_450x450_stretched_ms",
        "value": round(ms_per_step, 3),
        "unit": "ms/step",
        "vs_baseline": round(baseline_ms / ms_per_step, 3),
        "detail": {
            "platform": jax.devices()[0].platform,
            "device": str(jax.devices()[0]),
            "dtype": "float32",
            "v_iters": int(stats["v_iters"]),
            "p_iters": int(stats["p_iters"]),
            "p_res": float(stats["p_res"]),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
