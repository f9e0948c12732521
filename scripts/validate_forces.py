"""Quantitative force-coefficient validation harness.

Runs the BASELINE.md physics-parity cases end-to-end and reduces the
forces log to the published validation numbers (reference:
doc/markdowns/examples2d.md:78-136 and the examples' postprocessing
scripts, e.g. examples/ibpm/cylinder2dRe40/scripts/plotDragCoefficient.py
which plots Cd = 2*fx against Koumoutsakos & Leonard 1995):

  re40         decoupled IBPM cylinder Re=40, 186^2 stretched, t=20
               target: Cd ~ 1.5-1.6 (Koumoutsakos & Leonard 1995)
  re200        decoupled IBPM cylinder Re=200, 450^2 stretched, developed
               vortex shedding; targets: mean Cd ~ 1.25-1.45,
               Cl amplitude ~ 0.55-0.75, Strouhal ~ 0.19-0.21
               (Braza et al. 1986; Liu et al. 1998 — the standard refs)
  oscillating  rigid-kinematics in-line oscillating cylinder, Re=100 KC=5;
               Morison fit of the in-line force history:
               CD ~ 2.09, CM ~ 1.45 (Dutsch et al. 1998)
  sphere300    decoupled IBPM 3D sphere Re=300; targets: Cd ~ 0.63-0.68,
               |Cl| ~ 0.04-0.09 (Johnson & Patel 1999)

Each case prints one JSON line and appends it to validation/<case>.json.
Run one case per process; over the tunneled TPU never run two at once:

  python scripts/validate_forces.py re40
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_case(name: str, overrides: dict | None = None) -> dict:
    from petibm_tpu.config import load_config

    directory = os.path.join(REPO, "examples", "decoupledibpm", name)
    cfg = load_config(directory=directory)
    out = os.path.join(directory, "output")
    cfg["output"] = out
    cfg["logs"] = os.path.join(out, "logs")
    params = cfg.setdefault("parameters", {})
    for key, val in (overrides or {}).items():
        params[key] = val
    return cfg


def read_forces(output_dir: str, dim: int = 2) -> np.ndarray:
    """(n, 1+dim) array: t, fx, fy[, fz] of body 0."""
    return np.loadtxt(os.path.join(output_dir, "forces-0.txt"))


def run(cfg: dict, solver_cls) -> tuple:
    t0 = time.perf_counter()
    solver = solver_cls(cfg)
    t1 = time.perf_counter()
    solver.run()
    t2 = time.perf_counter()
    solver._steady_ms = steady_step_ms(solver)
    solver.close()
    return solver, t1 - t0, t2 - t1


def steady_step_ms(solver) -> float | None:
    """Steady-state step time on the developed final state — run_s/nt
    conflates the one-time XLA compile of the chunked-scan program with
    compute (e.g. ~47 of re550's 59 run_s seconds were compile), so each
    record carries both.  Reuses the already-compiled chunk program and
    bench.py's honest sync (block_until_ready acks before execution over
    the tunneled TPU; only a data-dependent device_get truly blocks), and
    sizes the measured span to ~2 s so the ~30-50 ms relay round trip
    stays in the noise."""
    import jax

    if solver._chunk_fn is None:
        return None
    k = solver.steps_per_dispatch
    state = solver.state

    def sync(stats):
        return float(jax.device_get(stats["p_res"])[-1])

    state, stats = solver._chunk_fn(state)
    sync(stats)
    t0 = time.perf_counter()
    state, stats = solver._chunk_fn(state)
    sync(stats)
    rough = time.perf_counter() - t0  # one chunk + one sync, seconds
    m = min(40, max(1, int(round(2.0 / max(rough, 0.05)))))
    t0 = time.perf_counter()
    for _ in range(m):
        state, stats = solver._chunk_fn(state)
    sync(stats)
    return (time.perf_counter() - t0) / (m * k) * 1e3


def emit(case: str, result: dict) -> None:
    from provenance import provenance

    result.setdefault("provenance", provenance())
    # slow-tier tests redirect records to a temp dir via this env var
    vdir = os.environ.get("PETIBM_VALIDATION_DIR",
                          os.path.join(REPO, "validation"))
    os.makedirs(vdir, exist_ok=True)
    line = json.dumps(result)
    print(line)
    with open(os.path.join(vdir, f"{case}.json"), "w") as fh:
        fh.write(line + "\n")


def platform_detail(setup_s: float, run_s: float, nt: int,
                    solver=None) -> dict:
    import jax

    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0]),
           "setup_s": round(setup_s, 1), "run_s": round(run_s, 1),
           "steps": nt, "ms_per_step": round(run_s / nt * 1e3, 3)}
    steady = getattr(solver, "_steady_ms", None)
    if steady is not None:
        out["steady_ms_per_step"] = round(steady, 3)
        out["note"] = ("ms_per_step = run_s/steps includes the one-time "
                       "XLA compile; steady_ms_per_step is the developed-"
                       "state compute rate")
    return out


# ----------------------------------------------------------------------
def case_re40(args) -> None:
    from petibm_tpu.solvers.decoupledibpm import DecoupledIBPMSolver

    cfg = load_case("cylinder2dRe40", {
        "nt": args.nt or 2000, "nsave": 500, "nrestart": 100000,
        "dtype": args.dtype, "stepsPerDispatch": args.chunk})
    solver, setup_s, run_s = run(cfg, DecoupledIBPMSolver)
    data = read_forces(cfg["output"])
    t, cd = data[:, 0], 2 * data[:, 1]
    # Koumoutsakos & Leonard 1995: Cd ~ 1.55 at t = 20 (examples2d.md:80)
    cd_end = float(cd[-1])
    result = {
        "case": "cylinder2dRe40_decoupledibpm",
        "grid": "186x186 stretched",
        "cd_at_t": {f"{tt:g}": float(np.interp(tt, t, cd))
                    for tt in (2.0, 5.0, 10.0, 20.0) if tt <= t[-1] + 1e-9},
        "cd_final": round(cd_end, 4), "t_final": float(t[-1]),
        "target": "Cd 1.5-1.6 at t=20 (Koumoutsakos & Leonard 1995)",
        "pass": bool(1.5 <= cd_end <= 1.65),
        "detail": platform_detail(setup_s, run_s, len(t), solver),
    }
    emit("re40", result)


def case_re200(args) -> None:
    from petibm_tpu.solvers.decoupledibpm import DecoupledIBPMSolver

    nt = args.nt or 48000  # dt 0.0025 -> t = 120: developed shedding
    cfg = load_case("cylinder2dRe200", {
        "nt": nt, "nsave": 8000, "nrestart": 1000000,
        "dtype": args.dtype, "stepsPerDispatch": args.chunk})
    # a small v-pulse near the body breaks the y mirror symmetry so
    # vortex shedding onsets early; the transient washes out and the
    # late-time statistics reported below are IC-independent
    cfg["flow"]["initialVelocity"] = [1.0, "0.1*exp(-(x*x + y*y))"]
    solver, setup_s, run_s = run(cfg, DecoupledIBPMSolver)
    data = read_forces(cfg["output"])
    t, cd, cl = data[:, 0], 2 * data[:, 1], 2 * data[:, 2]
    # statistics over the last 40% (developed shedding)
    sel = t >= 0.6 * t[-1]
    cd_mean = float(np.mean(cd[sel]))
    cl_amp = float(0.5 * (np.max(cl[sel]) - np.min(cl[sel])))
    # Strouhal from mean period between upward zero crossings of Cl
    cls, ts = cl[sel], t[sel]
    crossings = ts[1:][(cls[:-1] < 0) & (cls[1:] >= 0)]
    strouhal = (float(1.0 / np.mean(np.diff(crossings)))
                if len(crossings) > 2 else None)
    result = {
        "case": "cylinder2dRe200_decoupledibpm",
        "grid": "450x450 stretched",
        "cd_mean": round(cd_mean, 4), "cl_amp": round(cl_amp, 4),
        "strouhal": round(strouhal, 4) if strouhal else None,
        "t_final": float(t[-1]),
        "target": "Cd ~ 1.25-1.45, Cl amp ~ 0.55-0.75, St ~ 0.19-0.21 "
                  "(Braza et al. 1986; Liu et al. 1998)",
        "pass": bool(1.25 <= cd_mean <= 1.45 and 0.5 <= cl_amp <= 0.8
                     and strouhal and 0.185 <= strouhal <= 0.215),
        "detail": platform_detail(setup_s, run_s, len(t), solver),
    }
    emit("re200", result)


def case_oscillating(args) -> None:
    from petibm_tpu.solvers.rigidkinematics import RigidKinematicsSolver

    nt = args.nt or 10000  # dt 0.002, T = 1/f = 5 -> 4 periods
    cfg = load_case("oscillatingcylinder2dRe100", {
        "nt": nt, "nsave": 2000, "nrestart": 1000000,
        "dtype": args.dtype, "stepsPerDispatch": args.chunk})
    solver, setup_s, run_s = run(cfg, RigidKinematicsSolver)
    data = read_forces(cfg["output"])
    t, fx = data[:, 0], data[:, 1]
    # Morison-equation fit over the last 2 periods:
    #   Fx(t) = -1/2 CD D |u| u - CM rho pi D^2/4 du/dt,
    # cylinder velocity u(t) = -Um cos(2 pi f t) (x = -Am sin(2 pi f t))
    f, D, KC = 0.2, 1.0, 5.0
    Um = KC * f * D
    sel = t >= t[-1] - 2.0 / f
    ts, fs = t[sel], fx[sel]
    u = -Um * np.cos(2 * np.pi * f * ts)
    dudt = Um * 2 * np.pi * f * np.sin(2 * np.pi * f * ts)
    # internal-fluid inertia correction: the Lagrangian force sum includes
    # accelerating the fictitious fluid inside the body, so add rho*V*a_body
    # before reducing — exactly what the reference's own postprocessing does
    # (examples/api_examples/oscillatingcylinder2dRe100_GPU/scripts/
    # plotDragCoefficient.py:31-33, "Add force due to body acceleration");
    # without it CM comes out high by ~V/(pi D^2/4) = 1.0
    fs = fs + np.pi * D**2 / 4 * dudt
    basis = np.stack([-0.5 * D * np.abs(u) * u,
                      -np.pi * D**2 / 4 * dudt], axis=1)
    (cd_fit, cm_fit), *_ = np.linalg.lstsq(basis, fs, rcond=None)
    result = {
        "case": "oscillatingcylinder2dRe100_rigidkinematics",
        "grid": "512x512 uniform", "KC": KC, "Re": 100,
        "cd_morison": round(float(cd_fit), 4),
        "cm_morison": round(float(cm_fit), 4),
        "t_final": float(t[-1]),
        "target": "CD ~ 2.09, CM ~ 1.45 (Dutsch et al. 1998, Re=100 KC=5)",
        "pass": bool(1.85 <= cd_fit <= 2.35 and 1.2 <= cm_fit <= 1.7),
        "detail": platform_detail(setup_s, run_s, len(t), solver),
    }
    emit("oscillating", result)


def case_sphere300(args) -> None:
    from petibm_tpu.solvers.decoupledibpm import DecoupledIBPMSolver

    nt = args.nt or 12000  # dt 0.005 -> t = 60 (shedding onset ~ t 30)
    cfg = load_case("sphere3dRe300", {
        "nt": nt, "nsave": 4000, "nrestart": 1000000,
        "dtype": args.dtype, "stepsPerDispatch": args.chunk})
    solver, setup_s, run_s = run(cfg, DecoupledIBPMSolver)
    data = read_forces(cfg["output"])
    area = np.pi / 4  # frontal area of the unit-diameter sphere
    t = data[:, 0]
    cd = 2 * data[:, 1] / area
    cl = 2 * np.sqrt(data[:, 2] ** 2 + data[:, 3] ** 2) / area
    sel = t >= 0.7 * t[-1]
    cd_mean, cl_mean = float(np.mean(cd[sel])), float(np.mean(cl[sel]))
    result = {
        "case": "sphere3dRe300_decoupledibpm",
        "grid": "160x130x130 stretched",
        "cd_mean": round(cd_mean, 4), "cl_mean": round(cl_mean, 4),
        "t_final": float(t[-1]),
        "target": "Cd ~ 0.63-0.68, Cl ~ 0.04-0.09 (Johnson & Patel 1999)",
        "pass": bool(0.60 <= cd_mean <= 0.72),
        "detail": platform_detail(setup_s, run_s, len(t), solver),
    }
    emit("sphere300", result)


def _kl_curve_compare(t, cd, re: int, t_min: float = 0.5) -> dict:
    """Pointwise Cd(t) comparison against the vendored Koumoutsakos &
    Leonard (1995) digitized curve (examples/data/..., copied from the
    reference's examples/data; time axis U*t/R -> halve to U*t/D, the
    convention of the reference's plotDragCoefficient.py scripts).

    Deviations are reported over published samples with t >= t_min
    (default 0.5: the impulsive start's Cd -> infinity transient is
    digitization- and dt-resolution-dominated below that)."""
    path = os.path.join(REPO, "examples", "data",
                        f"koumoutsakos_leonard_1995_cylinder_"
                        f"dragCoefficientRe{re}.dat")
    tp, cdp = np.loadtxt(path, unpack=True)
    tp = 0.5 * tp
    sel = (tp >= t_min) & (tp <= t[-1] + 1e-9)
    tp, cdp = tp[sel], cdp[sel]
    cds = np.interp(tp, t, cd)
    dev = cds - cdp
    return {
        "n_published_samples": int(len(tp)),
        "t_range_compared": [float(tp[0]), float(tp[-1])],
        "rms_dev": round(float(np.sqrt(np.mean(dev**2))), 4),
        "max_abs_dev": round(float(np.max(np.abs(dev))), 4),
        "mean_cd_published": round(float(np.mean(cdp)), 4),
        "mean_cd_simulated": round(float(np.mean(cds)), 4),
    }


def _case_kl_cylinder(args, name: str, re: int, rms_tol: float,
                      max_tol: float) -> None:
    """Impulsively-started cylinder, Cd(t) history vs K&L 1995
    (reference: doc/markdowns/examples2d.md:133-136, the two hardest
    published 2D targets; examples run t in (0, 3]).

    Uses the *coupled* IBPM (the reference's example family for these
    cases, examples/ibpm/cylinder2dRe{550,3000}): the impulsive-start
    transient IS the validation target, and the decoupled scheme's
    lagged force/pressure splitting rings during it (a dt-independent
    ~44-step damped oscillation from the two non-commuting constraint
    projections; measured in round 4 — see docs/performance.md) while
    the coupled solve imposes both constraints simultaneously and
    tracks the published curve from t ~ 0.1."""
    from petibm_tpu.solvers.ibpm import IBPMSolver

    directory = os.path.join(REPO, "examples", "ibpm", f"cylinder2dRe{re}")
    from petibm_tpu.config import load_config

    cfg = load_config(directory=directory)
    out = os.path.join(directory, "output")
    cfg["output"] = out
    cfg["logs"] = os.path.join(out, "logs")
    cfg["parameters"].update({
        "nsave": 100000, "nrestart": 1000000,
        "dtype": args.dtype, "stepsPerDispatch": args.chunk})
    if args.nt:
        cfg["parameters"]["nt"] = args.nt
    solver, setup_s, run_s = run(cfg, IBPMSolver)
    data = read_forces(cfg["output"])
    t, cd = data[:, 0], 2 * data[:, 1]
    cmp = _kl_curve_compare(t, cd, re)
    result = {
        "case": f"cylinder2dRe{re}_ibpm",
        "grid": "450x450 stretched" if re == 550 else "986x986 stretched",
        "curve_vs_koumoutsakos_leonard_1995": cmp,
        "t_final": float(t[-1]),
        "target": f"Cd(t) history within rms {rms_tol} / max {max_tol} of "
                  "the digitized K&L 1995 curve for t in [0.5, 3]",
        "pass": bool(cmp["rms_dev"] <= rms_tol
                     and cmp["max_abs_dev"] <= max_tol),
        "detail": platform_detail(setup_s, run_s, len(t), solver),
    }
    emit(name, result)


def case_re550(args) -> None:
    _case_kl_cylinder(args, "re550", 550, rms_tol=0.06, max_tol=0.12)


def case_re3000(args) -> None:
    _case_kl_cylinder(args, "re3000", 3000, rms_tol=0.08, max_tol=0.16)


def case_flatplate(args) -> None:
    """3D flat-plate (AR=2, Re=100) AoA sweep: time-averaged Cd/Cl vs the
    experimental data of Dickinson vendored by the reference
    (examples/data/taira_et_al_2007_flatPlateRe100AR2_{Cd,Cl}vsAoA.dat;
    reference example: examples/decoupledibpm/flatplate3dRe100AoA30_GPU,
    doc/markdowns/examples3d.md).  The reference's convention: forces ARE
    the coefficients (0.5*rho*U^2*c*AR = 1), averaged over t in [15, 20]
    (plotForceCoefficients.py:20-27).  All angles reuse one compiled
    program — body coordinates are data, not shapes."""
    import math

    from petibm_tpu.config import load_config
    from petibm_tpu.solvers.decoupledibpm import DecoupledIBPMSolver

    directory = os.path.join(REPO, "examples", "decoupledibpm",
                             "flatplate3dRe100")
    angles = [float(a) for a in (args.angles or "0,10,20,30,40").split(",")]
    chord, ar, ds = 1.0, 2.0, 0.04

    def write_body(path, aoa):
        # identical point layout to the reference's createBody.py
        n = math.ceil(chord / ds)
        s = np.linspace(-chord / 2, chord / 2, num=n + 1)
        x = np.cos(np.radians(-aoa)) * s
        y = np.sin(np.radians(-aoa)) * s
        nz = math.ceil(chord * ar / ds)
        z = np.linspace(-chord * ar / 2, chord * ar / 2, num=nz + 1)
        with open(path, "w") as fh:
            fh.write(f"{x.size * z.size}\n")
            for zi in z:
                for xi, yi in zip(x, y):
                    fh.write(f"{xi:.16e}\t{yi:.16e}\t{zi:.16e}\n")

    tp_cd = np.loadtxt(os.path.join(
        REPO, "examples", "data",
        "taira_et_al_2007_flatPlateRe100AR2_CdvsAoA.dat"), unpack=True)
    tp_cl = np.loadtxt(os.path.join(
        REPO, "examples", "data",
        "taira_et_al_2007_flatPlateRe100AR2_ClvsAoA.dat"), unpack=True)

    points, worst = [], 0.0
    for aoa in angles:
        cfg = load_config(directory=directory)
        out = os.path.join(directory, "output", f"aoa{int(aoa)}")
        cfg["output"] = out
        cfg["logs"] = os.path.join(out, "logs")
        body = os.path.join(out, "flatplate.body")
        os.makedirs(out, exist_ok=True)
        write_body(body, aoa)
        cfg["bodies"] = [{"type": "points", "file": body}]
        cfg["parameters"].update({
            "nsave": 100000, "nrestart": 1000000,
            "dtype": args.dtype, "stepsPerDispatch": args.chunk})
        if args.nt:
            cfg["parameters"]["nt"] = args.nt
        solver, setup_s, run_s = run(cfg, DecoupledIBPMSolver)
        data = read_forces(out)
        t, cd, cl = data[:, 0], data[:, 1], data[:, 2]
        sel = (t >= 15.0) & (t <= 20.0)
        if not sel.any():
            sel = t >= 0.75 * t[-1]
        cd_m, cl_m = float(np.mean(cd[sel])), float(np.mean(cl[sel]))
        cd_pub = float(np.interp(aoa, tp_cd[0], tp_cd[1]))
        cl_pub = float(np.interp(aoa, tp_cl[0], tp_cl[1]))
        dev = max(abs(cd_m - cd_pub), abs(cl_m - cl_pub))
        worst = max(worst, dev)
        points.append({"aoa": aoa, "cd": round(cd_m, 4),
                       "cl": round(cl_m, 4),
                       "cd_published": round(cd_pub, 4),
                       "cl_published": round(cl_pub, 4),
                       "max_abs_dev": round(dev, 4),
                       "ms_per_step": round(run_s / len(t) * 1e3, 2)})
        print(json.dumps(points[-1]))
    result = {
        "case": "flatplate3dRe100_aoa_sweep_decoupledibpm",
        "grid": "127x56x84 stretched (reference-identical)",
        "points": points,
        "worst_abs_dev": round(worst, 4),
        "target": "time-averaged Cd/Cl within 0.15 of the Dickinson "
                  "experimental curve (Taira et al. 2007) at every AoA",
        "pass": bool(worst <= 0.15),
        "detail": dict(
            {k: v for k, v in platform_detail(0.0, 0.0, 1).items()
             if k in ("platform", "device")},
            steps="2000/angle",
            ms_per_step=(f"{min(p['ms_per_step'] for p in points):.0f}-"
                         f"{max(p['ms_per_step'] for p in points):.0f}"),
            angles=angles, avg_window="t in [15, 20]",
            note="per-angle ms_per_step in points[] (first angle includes "
                 "compile)"),
    }
    emit("flatplate", result)


def case_multicylinders(args) -> None:
    """Two side-by-side cylinders (y = +-2.5D) in a y-periodic channel at
    Re=100 (reference example: decoupledibpm/multicylinders2dRe100_GPU):
    exercises multi-body force logging + periodic-direction solvers on
    the TPU.  At 5D spacing each cylinder behaves near-isolated: mean Cd
    ~ 1.25-1.55 with St ~ 0.15-0.18 (Williamson 1996 isolated-cylinder
    values, mild blockage), and the symmetric positions must give
    matching statistics."""
    from petibm_tpu.solvers.decoupledibpm import DecoupledIBPMSolver

    nt = args.nt or 20000  # dt 0.01 -> t = 200
    cfg = load_case("multicylinders2dRe100", {
        "nt": nt, "nsave": 1000000, "nrestart": 1000000,
        "dtype": args.dtype, "stepsPerDispatch": args.chunk})
    solver, setup_s, run_s = run(cfg, DecoupledIBPMSolver)
    data = np.loadtxt(os.path.join(cfg["output"], "forces-0.txt"))
    t = data[:, 0]
    sel = t >= 0.6 * t[-1]
    bodies = []
    for b in range(2):
        cd = 2 * data[:, 1 + 2 * b]
        cl = 2 * data[:, 2 + 2 * b]
        cls, ts = cl[sel], t[sel]
        crossings = ts[1:][(cls[:-1] < 0) & (cls[1:] >= 0)]
        st = (float(1.0 / np.mean(np.diff(crossings)))
              if len(crossings) > 2 else None)
        bodies.append({"cd_mean": round(float(np.mean(cd[sel])), 4),
                       "cl_mean": round(float(np.mean(cl[sel])), 4),
                       "strouhal": round(st, 4) if st else None})
    dcd = abs(bodies[0]["cd_mean"] - bodies[1]["cd_mean"])
    ok = all(1.6 <= b["cd_mean"] <= 1.9
             and b["strouhal"] and 0.18 <= b["strouhal"] <= 0.22
             for b in bodies) and dcd <= 0.02
    result = {
        "case": "multicylinders2dRe100_decoupledibpm",
        "grid": "511x500, y-periodic channel, 2 bodies x 157 pts",
        "bodies": bodies, "cd_symmetry_gap": round(dcd, 4),
        "t_final": float(t[-1]),
        "target": "each: Cd ~ 1.6-1.9, St ~ 0.18-0.22 (20% blockage; "
                  "Sahin & Owens 2004 confined cylinder at beta=0.2 "
                  "gives Cd 1.71-1.76, St 0.19-0.20); symmetric pair "
                  "statistics match",
        "pass": bool(ok),
        "detail": platform_detail(setup_s, run_s, len(t), solver),
    }
    emit("multicylinders", result)


CASES = {"re40": case_re40, "re200": case_re200,
         "oscillating": case_oscillating, "sphere300": case_sphere300,
         "re550": case_re550, "re3000": case_re3000,
         "flatplate": case_flatplate,
         "multicylinders": case_multicylinders}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("case", choices=sorted(CASES))
    ap.add_argument("--nt", type=int, default=None)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--chunk", type=int, default=50,
                    help="stepsPerDispatch")
    ap.add_argument("--angles", default=None,
                    help="flatplate: comma list of AoA degrees")
    args = ap.parse_args()
    CASES[args.case](args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
