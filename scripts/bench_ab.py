"""End-to-end A/B of the Pallas kernel paths on the 450^2 headline bench.

Four configurations of the decoupled-IBPM cylinder Re=200 step (the
bench.py case): fused-apply kernel on/off x fused line-sweep kernels
on/off.  Prints one JSON line per configuration.  This is the
measurement behind the dispatch defaults (docs/performance.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench import build_config  # noqa: E402  (repo-root bench.py)
import tempfile


def measure(disable_pallas: bool, fused_sweeps: bool):
    from petibm_tpu.solvers.decoupledibpm import DecoupledIBPMSolver

    tmpdir = tempfile.mkdtemp(prefix="petibm_ab_")
    cfg = build_config(tmpdir)
    if disable_pallas:
        cfg["parameters"]["disablePallas"] = True
    solver = DecoupledIBPMSolver(cfg)
    for mg in (getattr(solver, "poisson_mg", None),
               getattr(solver, "poisson_mg_lp", None)):
        if mg is not None:
            mg.fused_sweeps = fused_sweeps

    def sync(stats):
        return float(jax.device_get(stats["p_res"])[-1])

    k = solver.steps_per_dispatch
    state = solver.state
    for _ in range(4):
        state, stats = solver._chunk_fn(state)
    sync(stats)
    t0 = time.perf_counter()
    chunks = 12
    for _ in range(chunks):
        state, stats = solver._chunk_fn(state)
        sync(stats)
    ms = (time.perf_counter() - t0) / (chunks * k) * 1e3
    print(json.dumps({
        "metric": "ab_450sq_step_ms",
        "value": round(ms, 3), "unit": "ms/step",
        "detail": {"pallas_apply": not disable_pallas,
                   "fused_sweeps": fused_sweeps}}))
    sys.stdout.flush()


def main():
    for disable_pallas, fused in ((False, True), (True, True),
                                  (False, False), (True, False)):
        measure(disable_pallas, fused)


if __name__ == "__main__":
    main()
