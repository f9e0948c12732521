"""Run the four lid-driven-cavity example cases end-to-end through the
public CLI path and record validation/cavity_ghia.json (the Ghia et al.
1982 centerline sweep; reference target: doc/markdowns/examples2d.md:29).

  python scripts/record_cavity_sweep.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

CASES = {100: "32x32", 1000: "128x128", 3200: "192x192", 5000: "256x256"}


def main() -> int:
    import h5py
    import numpy as np

    from validate_cavity import GHIA_U, GHIA_V, RE_COL, interp_line

    results, ok = {}, True
    for re_, grid in CASES.items():
        d = os.path.join(REPO, "examples", "navierstokes",
                         f"liddrivencavity2dRe{re_}")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-m", "petibm_tpu.cli.navierstokes",
             "-directory", d], capture_output=True, text=True,
            cwd=REPO, timeout=3600)
        run_s = time.perf_counter() - t0
        if proc.returncode != 0:
            print(proc.stdout[-2000:], proc.stderr[-2000:])
            raise SystemExit(f"Re={re_} run failed")
        out = os.path.join(d, "output")
        snaps = sorted(f for f in os.listdir(out)
                       if f.endswith(".h5") and f != "grid.h5")
        with h5py.File(os.path.join(out, "grid.h5")) as g:
            xu, yu = g["u/x"][:], g["u/y"][:]
            xv, yv = g["v/x"][:], g["v/y"][:]
        with h5py.File(os.path.join(out, snaps[-1])) as f:
            u, v = f["u"][:], f["v"][:]
        col = RE_COL[re_]
        u_mid = np.array([interp_line(xu, u[j, :], 0.5)
                          for j in range(u.shape[0])])
        u_sim = np.interp(GHIA_U[:, 0], yu, u_mid, left=0.0)
        u_sim[GHIA_U[:, 0] >= 1.0] = GHIA_U[GHIA_U[:, 0] >= 1.0, col]
        u_sim[GHIA_U[:, 0] <= 0.0] = 0.0
        v_mid = np.array([interp_line(yv, v[:, i], 0.5)
                          for i in range(v.shape[1])])
        v_sim = np.interp(GHIA_V[:, 0], xv, v_mid, left=0.0)
        v_sim[(GHIA_V[:, 0] <= 0.0) | (GHIA_V[:, 0] >= 1.0)] = 0.0
        u_rms = float(np.sqrt(np.mean((u_sim - GHIA_U[:, col]) ** 2)))
        v_rms = float(np.sqrt(np.mean((v_sim - GHIA_V[:, col]) ** 2)))
        steps = int(snaps[-1].split(".")[0])
        results[f"Re{re_}"] = {
            "grid": grid, "steps": steps,
            "u_rms": round(u_rms, 5), "v_rms": round(v_rms, 5),
            "run_s": round(run_s)}
        ok = ok and u_rms <= 0.05 and v_rms <= 0.05
        print(json.dumps({f"Re{re_}": results[f"Re{re_}"]}))

    import jax

    from provenance import provenance

    record = {
        "case": "liddrivencavity_ghia_sweep",
        "target": "centerline u/v RMS deviation vs Ghia et al. (1982) "
                  "tables I/II <= 0.05 (the reference validates the same "
                  "profiles, examples2d.md:29); grids/dt from the "
                  "reference-identical example configs",
        "results": results,
        "pass": bool(ok),
        "detail": {"platform": jax.devices()[0].platform,
                   "device": str(jax.devices()[0]),
                   "dtype": "float32",
                   "note": "full example-config runs via the public CLI; "
                           "centerline comparison per "
                           "scripts/validate_cavity.py",
                   "run_s_note": "run_s includes process start + XLA "
                                 "compile"},
        "provenance": provenance(),
    }
    line = json.dumps(record)
    print(line)
    with open(os.path.join(REPO, "validation", "cavity_ghia.json"),
              "w") as fh:
        fh.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
