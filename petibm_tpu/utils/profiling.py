"""Per-phase device-time breakdown of the jitted time step.

The reference delimits every phase of the step with PETSc log stages and
dumps -log_view tables at each save (reference: navierstokes.cpp:99-199,
io.cpp:274 writePetscLog).  A jitted XLA step is one fused program, so
phase times cannot be read from inside it; instead each phase is jitted
separately (solver._profile_phases) and timed with the *sync-point sweep*:

  For sync index i, run `steps` full time steps — every phase dispatched
  every step, so the state advances exactly as in production — but block
  (device_get of a scalar data-dependent on phase i's output) only after
  phase i.  T(i) is then the per-step wall time of phases 0..i plus one
  host/device round trip; phase i's own time is T(i) - T(i-1), with the
  round-trip latency cancelling in the difference.

This stays honest over the relayed TPU, where block_until_ready acks
before execution finishes and only a value transfer really syncs
(bench.py has the same constraint).  Negative differences (noise at
microsecond-scale phases) clamp to zero.

There is also ``trace()`` for a raw jax-profiler trace of the production
fused step (for xprof/tensorboard), which XLA-fuses across phases and is
the number to compare with bench.py.
"""

from __future__ import annotations

import time

import jax


def profile_stages(solver, steps: int = 10, warmup: int = 3,
                   path: str | None = None) -> dict:
    """Run the sync-point sweep on ``solver``; returns {phase: ms} plus
    "_total" (sum of phases) and "_fused" (the production one-program
    step, for comparison).  Writes a stage table to ``path``."""
    phases = [(name, jax.jit(fn)) for name, fn in solver._profile_phases()]

    def run_once(state, sync_idx):
        ctx, probe_at = {"state": state}, None
        for k, (_, fn) in enumerate(phases):
            ctx, probe = fn(ctx)
            if k == sync_idx:
                probe_at = probe
        return ctx["state"], probe_at

    state = solver.state
    last = len(phases) - 1
    for _ in range(max(1, warmup)):
        state, probe = run_once(state, last)
    float(jax.device_get(probe))

    cum = []
    for i in range(len(phases)):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, probe = run_once(state, i)
            float(jax.device_get(probe))
        cum.append((time.perf_counter() - t0) / steps * 1e3)

    result = {}
    prev = None
    for (name, _), t in zip(phases, cum):
        # T(0) includes the host round trip; report differences only, with
        # the first phase measured against a pure-sync baseline (estimated
        # as the min observed round trip cannot be isolated here, so phase
        # 0 absorbs the latency — interpret it as an upper bound)
        result[name] = t if prev is None else max(0.0, t - prev)
        prev = t

    # the production fused step for comparison
    fused_state = state
    for _ in range(max(1, warmup)):
        fused_state, stats = solver._step_fn(fused_state)
    _sync_stats(stats)
    t0 = time.perf_counter()
    for _ in range(steps):
        fused_state, stats = solver._step_fn(fused_state)
        _sync_stats(stats)
    fused_ms = (time.perf_counter() - t0) / steps * 1e3
    result["_total"] = sum(v for k, v in result.items())
    result["_fused"] = fused_ms

    if path:
        _write_table(path, result, steps)
    return result


def _sync_stats(stats) -> None:
    leaf = next(v for k, v in sorted(stats.items()) if hasattr(v, "ravel"))
    float(jax.device_get(leaf.ravel()[0]))


def _write_table(path: str, result: dict, steps: int) -> None:
    phases = {k: v for k, v in result.items() if not k.startswith("_")}
    total = max(result.get("_total", 0.0), 1e-12)
    lines = [
        "stage breakdown (sync-point sweep, avg over "
        f"{steps} steps; phase 0 absorbs one host round trip)",
        f"{'stage':>16s} {'ms/step':>10s} {'%':>6s}",
    ]
    for name, ms in phases.items():
        lines.append(f"{name:>16s} {ms:10.4f} {100 * ms / total:6.1f}")
    lines.append(f"{'sum':>16s} {result['_total']:10.4f}")
    lines.append(f"{'fused step':>16s} {result['_fused']:10.4f}"
                 "   (production one-program step + sync)")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def trace(solver, out_dir: str, steps: int = 20) -> None:
    """jax-profiler trace of the production step (xprof/tensorboard)."""
    state = solver.state
    state, stats = solver._step_fn(state)  # compile outside the trace
    _sync_stats(stats)
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            state, stats = solver._step_fn(state)
        _sync_stats(stats)
