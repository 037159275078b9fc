"""Tracing / profiling / numerical-health subsystems.

The reference has none of these engineered (SURVEY.md §5: time.time() + tqdm
only, NaN loop behind a DEBUG flag, sync-execution env vars). First-class
here:

  - `trace(logdir)`: jax.profiler device trace around a code region
    (view in TensorBoard / xprof).
  - `StepTimer`: wall-clock + steps/sec with warmup-aware averaging.
  - `nan_guard`: jitted any-nonfinite check over a pytree (the reference's
    DEBUG NaN loop, run.py:2377-2379, without host sync per tensor).
  - `annotate`: named trace span (jax.profiler.TraceAnnotation).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """steps/sec with the first (compile) interval excluded."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.total = 0.0
        self.intervals = 0

    def tick(self, n: int = 1) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        self.intervals += 1
        if self.intervals > 1:  # skip compile interval
            self.steps += n
            self.total += dt
        return n / dt if dt > 0 else float("inf")

    @property
    def steady_rate(self) -> float:
        return self.steps / self.total if self.total > 0 else 0.0


@jax.jit
def nan_guard(tree) -> jnp.ndarray:
    """True if ANY leaf contains a non-finite value (single fused reduce)."""
    leaves = jax.tree_util.tree_leaves(tree)
    bad = jnp.zeros((), jnp.bool_)
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            bad = jnp.logical_or(bad, ~jnp.all(jnp.isfinite(leaf)))
    return bad


def check_metrics(metrics: Dict[str, jnp.ndarray], step: int) -> None:
    """Host-side guard for the cadenced log path (cheap: metrics only)."""
    for k, v in metrics.items():
        val = float(v)
        if val != val or val in (float("inf"), float("-inf")):
            raise FloatingPointError(
                f"[step {step}] metric {k!r} is non-finite: {val}")
