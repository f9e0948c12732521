"""Poisson SpMV throughput vs the HBM speed-of-light roofline.

BASELINE.md targets "Poisson SpMV at speed-of-light nnz/s per TPU chip".
The pressure Poisson matrix is a 5-point (2D) / 7-point (3D) banded system;
the TPU-native sparse format is DIA — per-diagonal dense value arrays with
fully contiguous loads (petibm_tpu.operators.pallas_stencil).  A DIA apply
is bandwidth-bound: per pressure cell it streams phi + out + (2*dim+1)
coefficient arrays once, performing 2*dim+1 multiply-adds (nnz per row).

  speed-of-light nnz/s = HBM_BW * nnz_per_row / bytes_per_row

This script measures the fused Pallas kernel and the XLA slice formulation
on the same operator (cylinder-bench 450x450 stretched grid and a uniform
1024x1024 grid) and prints one JSON line per configuration with achieved
nnz/s and the fraction of the measured-bandwidth roofline (estimated via a
saxpy stream probe on the same array size, which removes the need to know
the chip's datasheet bandwidth).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


# applies chained inside one jitted program: per-dispatch latency over the
# device tunnel (~0.3 ms) would otherwise swamp the per-apply time
CHAIN = 100


def _chained(fn):
    @jax.jit
    def run(phi):
        return jax.lax.fori_loop(0, CHAIN, lambda i, x: fn(x), phi)

    return run


def _sync(x) -> float:
    """Honest completion barrier: over the relayed TPU block_until_ready
    acks before execution finishes; only a value transfer really syncs."""
    return float(jax.device_get(x.ravel()[0]))


def stream_bw_bytes_per_s(dtype=jnp.float32, repeats=3, shape=(8192, 8192),
                          chain=100):
    """Measured HBM bandwidth via a chained x = 2x + y stream (reads x,y;
    writes x each iteration) over a 512 MB working set (x + y) — a 64 MB
    set fits entirely in the v5e's 128 MB VMEM and measured ~2.7 TB/s of
    on-chip bandwidth instead of HBM's ~0.8 TB/s, which wrecked the
    roofline denominator.  The chain makes the measured span ~1 s so the
    ~50 ms relay sync round trip stays in the noise."""
    y = jnp.ones(shape, dtype) * 1e-9

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, chain, lambda i, v: 2.0 * v + y, x)

    x = run(jnp.zeros(shape, dtype))
    _sync(x)
    t0 = time.perf_counter()
    for _ in range(repeats):
        x = run(x)
    _sync(x)
    dt = time.perf_counter() - t0
    nbytes = np.prod(shape) * np.dtype(dtype).itemsize
    return 3 * nbytes * chain * repeats / dt


def make_level(ns, stretched=True):
    """A PoissonMG finest level for an ns[0] x ns[1] (y, x) grid."""
    from petibm_tpu.linalg.mg import PoissonMG

    rng = np.random.default_rng(0)
    dxs = []
    for n in reversed(ns):  # (x, y) order for PoissonMG
        if stretched:
            w = np.geomspace(1.0, 1.5, n)
        else:
            w = np.ones(n)
        dxs.append(w / w.sum())
    mg = PoissonMG(dxs, [False] * len(ns), dtype=jnp.float32)
    phi = jnp.asarray(rng.standard_normal(ns), jnp.float32)
    return mg, phi


def bench_apply(fn, phi, repeats=5):
    run = _chained(fn)
    out = run(phi)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = run(out)
    _sync(out)
    return (time.perf_counter() - t0) / (repeats * CHAIN)


def _time_chain(fn, phi, K: int, target_s: float = 1.0):
    """Seconds per program of K chained applies (>= target_s measured)."""
    run = jax.jit(lambda p: jax.lax.fori_loop(0, K, lambda i, x: fn(x), p))
    out = run(phi)
    _sync(out)
    t0 = time.perf_counter()
    out = run(out)
    _sync(out)
    rough = time.perf_counter() - t0
    reps = max(2, int(round(target_s / max(rough, 1e-3))))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(out)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def chain_sweep():
    """Decompose the per-apply floor: time K in {1, 16, 256} chained
    applies in one program each; the 16->256 slope is the true marginal
    per-apply device cost (dispatch+sync excluded), the intercept the
    per-program overhead.  An elementwise saxpy control at the same array
    size separates loop/runtime fixed cost from the stencil itself."""
    dev = jax.devices()[0]
    bw = stream_bw_bytes_per_s()
    results = []
    for name, ns in (("450sq_stretched", (450, 450)),
                     ("1024sq_uniform", (1024, 1024)),
                     ("2048sq_uniform", (2048, 2048))):
        mg, phi = make_level(ns, stretched="stretched" in name)
        ncells = int(np.prod(ns))
        pts = 2 * len(ns) + 1
        nnz = pts * ncells
        sol_nnz_s = bw * nnz / (2 * ncells * 4)

        from petibm_tpu.operators.pallas_stencil import make_pallas_poisson

        fused = make_pallas_poisson(mg)
        fn = jax.jit(fused) if fused is not None else jax.jit(
            lambda p: mg.apply_op(0, p))

        t = {K: _time_chain(fn, phi, K) for K in (1, 16, 256)}
        marginal = (t[256] - t[16]) / 240.0
        program_overhead = t[16] - 16 * marginal

        y = jnp.full_like(phi, 1e-9)
        ctrl = jax.jit(lambda x: 2.0 * x + y)
        tc = {K: _time_chain(ctrl, phi, K) for K in (16, 256)}
        ctrl_marginal = (tc[256] - tc[16]) / 240.0

        results.append({
            "metric": f"poisson_spmv_chain_{name}",
            "value": round(nnz / marginal / 1e9, 3),
            "unit": "Gnnz/s (marginal, dispatch-free)",
            "vs_roofline": round((nnz / marginal) / sol_nnz_s, 3),
            "detail": {
                "device": str(dev),
                "ms_marginal_per_apply": round(marginal * 1e3, 4),
                "ms_program_overhead": round(program_overhead * 1e3, 3),
                "ms_K1_program": round(t[1] * 1e3, 3),
                "ms_elementwise_marginal": round(ctrl_marginal * 1e3, 4),
                "stencil_vs_elementwise": round(marginal / ctrl_marginal, 2)
                if ctrl_marginal > 0 else None,
                "stream_GBps": round(bw / 1e9, 1),
                "kernel": "pallas" if fused is not None else "xla",
            },
        })
    for r in results:
        print(json.dumps(r))
    return results


def main():
    if "--chain-sweep" in sys.argv:
        results = chain_sweep()
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "validation", "perf_spmv.jsonl")
        with open(path, "a") as fh:
            for r in results:
                fh.write(json.dumps(r) + "\n")
        return
    dev = jax.devices()[0]
    results = []
    bw = stream_bw_bytes_per_s()
    for name, ns in (("450sq_stretched", (450, 450)),
                     ("1024sq_uniform", (1024, 1024)),
                     ("2048sq_uniform", (2048, 2048)),
                     ("64cube_uniform", (64, 64, 64)),
                     ("sphere3d_stretched", (160, 130, 130))):
        mg, phi = make_level(ns, stretched="stretched" in name)
        ncells = int(np.prod(ns))
        pts = 2 * len(ns) + 1  # 5-point (2D) / 7-point (3D) rows
        nnz = pts * ncells
        # mandatory streamed bytes: phi + out only — the operator factors
        # are separable 1D vectors (linalg/mg.py _Level), so the dense
        # coefficients cost no HBM traffic in the fused XLA formulation.
        # (The DIA Pallas kernels stream pts+2 dense arrays instead; their
        # per-format bound is bw*nnz/((pts+2)*ncells*4).)
        bytes_per_apply = 2 * ncells * 4
        sol_nnz_s = bw * nnz / bytes_per_apply

        xla_apply = jax.jit(lambda p: mg.apply_op(0, p))
        t_xla = bench_apply(xla_apply, phi)

        from petibm_tpu.operators.pallas_stencil import make_pallas_poisson

        fused = make_pallas_poisson(mg)
        t_pl = bench_apply(jax.jit(fused), phi) if fused is not None else None

        if fused is None:
            results.append({
                "metric": f"poisson_spmv_{name}_pallas",
                "value": None, "unit": "Gnnz/s",
                "detail": {"declined": "whole-array live set exceeds "
                           "the verified VMEM cap; XLA streaming "
                           "stencil is used instead (the tiled Pallas "
                           "variants were deleted after losing to XLA "
                           "- see pallas_stencil.py)"},
            })
        for label, t in (("xla", t_xla), ("pallas", t_pl)):
            if t is None:
                continue
            results.append({
                "metric": f"poisson_spmv_{name}_{label}",
                "value": round(nnz / t / 1e9, 3),
                "unit": "Gnnz/s",
                "vs_roofline": round((nnz / t) / sol_nnz_s, 3),
                "detail": {"device": str(dev), "ms_per_apply": round(t * 1e3, 4),
                           "stream_GBps": round(bw / 1e9, 1)},
            })
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
