"""Weak-scaling harness: constant per-device work, growing global grid.

BASELINE.json's target is >= 80% weak-scaling efficiency from 1 host to
N >= 2 hosts.  This harness runs the flagship decoupled-IBPM cylinder step
on a ("dy", "dx") device mesh whose global grid is ``base x base`` cells
PER DEVICE, so per-chip work is constant as devices are added; efficiency
is ms_per_step(1 device) / ms_per_step(N devices).

Single host (or the virtual CPU mesh):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/weak_scaling.py --devices 1
  ... --devices 8     # compare the two ms_per_step values

Multi-host (one process per host; run the same command on every host with
the env vars set, cf. petibm_tpu/parallel/multihost.py):

  PETIBM_TPU_COORDINATOR=host0:1234 PETIBM_TPU_NUM_PROCESSES=2 \
  PETIBM_TPU_PROCESS_ID=<k> python scripts/weak_scaling.py --distributed

Prints one JSON line per run; collect and divide for the efficiency.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_config(tmpdir: str, nx: int, ny: int, sharding: dict,
                 distributed) -> dict:
    npts = 100
    body = os.path.join(tmpdir, "circle.body")
    with open(body, "w") as fh:
        fh.write(f"{npts}\n")
        for k in range(npts):
            th = 2 * math.pi * k / npts
            fh.write(f"{0.5 * math.cos(th):.8e}\t{0.5 * math.sin(th):.8e}\n")
    cfg = {
        "directory": tmpdir,
        "output": os.path.join(tmpdir, "output"),
        "logs": os.path.join(tmpdir, "logs"),
        "mesh": [
            {"direction": "x", "start": -8.0,
             "subDomains": [{"end": 8.0, "cells": nx, "stretchRatio": 1.0}]},
            {"direction": "y", "start": -8.0,
             "subDomains": [{"end": 8.0, "cells": ny, "stretchRatio": 1.0}]},
        ],
        "flow": {
            "nu": 0.005,
            "initialVelocity": [1.0, 0.0],
            "boundaryConditions": [
                {"location": "xMinus", "u": ["DIRICHLET", 1.0],
                 "v": ["DIRICHLET", 0.0]},
                {"location": "xPlus", "u": ["CONVECTIVE", 1.0],
                 "v": ["CONVECTIVE", 1.0]},
                {"location": "yMinus", "u": ["DIRICHLET", 1.0],
                 "v": ["DIRICHLET", 0.0]},
                {"location": "yPlus", "u": ["DIRICHLET", 1.0],
                 "v": ["DIRICHLET", 0.0]},
            ],
        },
        "parameters": {
            "dt": 0.001, "nt": 1, "nsave": 10**9, "nrestart": 10**9,
            "dtype": "float32",
            "convection": "ADAMS_BASHFORTH_2", "diffusion": "CRANK_NICOLSON",
            "velocitySolver": {"type": "CPU", "atol": 1e-6, "max_it": 100},
            "poissonSolver": {"type": "CPU", "atol": 1e-6, "max_it": 500},
            "forcesSolver": {"type": "CPU", "atol": 1e-6, "max_it": 100},
            "sharding": sharding,
        },
        "bodies": [{"type": "points", "file": body}],
    }
    if distributed:
        cfg["parameters"]["distributed"] = True
    return cfg


def sweep(args) -> int:
    """Run the harness at each device count in its own subprocess on the
    virtual CPU mesh and record validation/weak_scaling.json.

    Efficiency metric on the VIRTUAL mesh: the N virtual devices share
    this host's physical cores, so per-device ms/step necessarily grows
    with N (total work grows, capacity doesn't) and the naive
    t(1)/t(N) ratio measures core contention, not SPMD quality.  The
    meaningful number is aggregate-throughput retention
    eff(N) = cells_per_s(N) / cells_per_s(1): with zero GSPMD partition
    and collective overhead the shared cores would sustain the same
    cells/s at any N.  On real multi-chip hardware (where each device
    adds capacity) the same cells-per-s accounting turns into the
    standard >= 80% weak-scaling target of BASELINE.md.
    """
    import subprocess

    counts = [int(c) for c in args.sweep.split(",")]
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count="
                          f"{max(counts)}").strip()
    points = []
    for n in counts:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--devices", str(n), "--base", str(args.base),
               "--steps", str(args.steps), "--warmup", str(args.warmup)]
        run = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=3600)
        line = [ln for ln in run.stdout.splitlines()
                if ln.startswith("{")]
        if run.returncode != 0 or not line:
            print(run.stdout, run.stderr, file=sys.stderr)
            return 1
        points.append(json.loads(line[-1]))
        print(line[-1])
    base_tp = points[0]["detail"]["cells_per_s"]
    result = {
        "metric": "weak_scaling_virtual_mesh",
        "protocol": f"decoupled-IBPM cylinder step, {args.base}^2 f32 cells "
                    "per device, 1->N virtual CPU devices on one host "
                    f"({os.cpu_count()} physical cores, shared)",
        "efficiency_throughput_retention": {
            str(p["detail"]["n_devices"]):
                round(p["detail"]["cells_per_s"] / base_tp, 3)
            for p in points},
        "caveat": "virtual 8-device mesh on shared host cores: ms/step "
                  "grows with total work by construction; the recorded "
                  "efficiency is aggregate cells/s retention vs 1 device "
                  "(SPMD partition+collective overhead), the virtual-mesh "
                  "analogue of weak-scaling efficiency.  Real multi-chip "
                  "hardware is unavailable in this environment.",
        "points": points,
    }
    path = os.path.join(REPO, "validation", "weak_scaling.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({"written": path,
                      "efficiency": result["efficiency_throughput_retention"]}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", type=int, default=256,
                    help="grid cells per device per direction-pair "
                         "(global grid = base*dy x base*dx)")
    ap.add_argument("--devices", type=int, default=None,
                    help="device count (default: all visible)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--distributed", action="store_true",
                    help="initialize jax.distributed before anything else")
    ap.add_argument("--sweep", type=str, default=None,
                    help="comma list of device counts; runs each in a "
                         "subprocess and records validation/weak_scaling.json")
    args = ap.parse_args()
    if args.sweep:
        return sweep(args)

    from petibm_tpu.parallel import maybe_initialize, process_info
    from petibm_tpu.parallel.dist import _factor2

    if args.distributed:
        maybe_initialize(True)
    import jax

    n_dev = args.devices or len(jax.devices())
    dy, dx = _factor2(n_dev)
    # constant work per device: scale each global axis by its mesh axis
    ny, nx = args.base * dy, args.base * dx
    sharding = ({"nDevices": n_dev, "shape": [dy, dx]} if n_dev > 1 else None)

    from petibm_tpu.solvers.decoupledibpm import DecoupledIBPMSolver

    tmpdir = tempfile.mkdtemp(prefix="petibm_tpu_weak_")
    cfg = build_config(tmpdir, nx, ny, sharding, args.distributed)
    solver = DecoupledIBPMSolver(cfg)

    state = solver.state
    step = solver._step_fn

    def sync(stats):
        return float(jax.device_get(stats["p_res"]))

    for _ in range(args.warmup):
        state, stats = step(state)
    sync(stats)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, stats = step(state)
    sync(stats)
    elapsed = time.perf_counter() - t0

    pid, nproc = process_info()
    ms = elapsed / args.steps * 1e3
    result = {
        "metric": "weak_scaling_step_ms",
        "value": round(ms, 3),
        "unit": "ms/step",
        "detail": {
            "platform": jax.devices()[0].platform,
            "n_devices": n_dev, "mesh": [dy, dx],
            "global_grid": [ny, nx], "cells_per_device": args.base**2,
            "cells_per_s": round(ny * nx / (ms / 1e3), 0),
            "process": [pid, nproc], "steps": args.steps,
        },
    }
    if pid == 0:
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
