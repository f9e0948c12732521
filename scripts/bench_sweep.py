"""Micro-benchmark of the multigrid smoother paths on the current device.

Times, per configuration (the 450^2 headline grid and the sphere3dRe300
grid, both stretched, f32):

- ``apply``: one fused finest-level operator apply (XLA separable
  formulation unless a Pallas DIA kernel is active via make_pallas_poisson)
- ``sweep_<d>``: one damped line-Jacobi sweep per direction — the fused
  whole-array kernel where it applies (pallas_sweep), else the unfused
  build + blocked-PCR + update path
- ``sweep_<d>_unfused``: the same sweep with the fused kernel disabled,
  for the A/B
- ``vcycle``: one full V-cycle (the Poisson CG preconditioner)

Prints one JSON line per timing.  Run alone on the TPU (see bench.py's
sync caveat: only a device_get truly synchronizes over the relay).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 50


def _chained(fn):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, CHAIN, lambda i, v: fn(v), x)

    return run


def _sync(x) -> float:
    return float(jax.device_get(x.ravel()[0]))


def bench(fn, x, repeats=3):
    run = _chained(fn)
    out = run(x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = run(out)
    _sync(out)
    return (time.perf_counter() - t0) / (repeats * CHAIN)


def make_mg(ns):
    from petibm_tpu.linalg.mg import PoissonMG

    rng = np.random.default_rng(0)
    dxs = [np.geomspace(1.0, 1.5, n) for n in reversed(ns)]
    dxs = [w / w.sum() for w in dxs]
    mg = PoissonMG(dxs, [False] * len(ns), dtype=jnp.float32)
    phi = jnp.asarray(rng.standard_normal(ns), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(ns), jnp.float32)
    return mg, phi, rhs


def main():
    results = []
    for name, ns in (("450sq", (450, 450)),
                     ("sphere3d", (130, 130, 160))):
        mg, phi, rhs = make_mg(ns)
        dim = len(ns)
        nbytes = phi.size * 4

        results.append((f"{name}_apply",
                        bench(lambda p: mg.apply_op(0, p), phi)))
        for d in range(dim):
            results.append((f"{name}_sweep_d{d}",
                            bench(lambda p, d=d: mg._line_sweep(0, p, rhs, d),
                                  phi)))
        # A/B: force the unfused build + blocked-PCR + update path
        mg.fused_sweeps = False
        for d in range(dim):
            results.append(
                (f"{name}_sweep_d{d}_unfused",
                 bench(lambda p, d=d: mg._line_sweep(0, p, rhs, d), phi)))
        mg.fused_sweeps = True

        results.append((f"{name}_vcycle", bench(lambda r: mg.vcycle(0, r),
                                                rhs)))
        for metric, t in results:
            if metric.startswith(name):
                print(json.dumps({
                    "metric": metric, "value": round(t * 1e3, 4),
                    "unit": "ms",
                    "detail": {"GBps_2arr": round(2 * nbytes / t / 1e9, 1),
                               "device": str(jax.devices()[0])}}))
        results = [r for r in results if not r[0].startswith(name)]


if __name__ == "__main__":
    main()
