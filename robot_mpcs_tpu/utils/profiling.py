"""Tracing / profiling utilities — the observability layer the reference lacks.

SURVEY §5: the reference's only timing signal is the ForcesPro ``info`` struct
returned at ``robotmpcs/planner/mpcPlanner.py:262`` — captured and then never
inspected. Here profiling is first-class:

* :func:`trace` — context manager emitting a JAX profiler trace (viewable in
  TensorBoard / Perfetto) around any region, e.g. one fleet step.
* :class:`StepTimer` — lightweight wall-clock histogram for steady-state
  loops; reports p50/p95/max without host<->device sync beyond what the
  caller already does.
* :func:`timed` — block-until-ready one-shot timer for microbenchmarks.

Per-solve iteration counts (the "how hard did the solver work" signal) ride
the metrics path instead: ``SolveResult.iterations`` and
``FleetMetrics.mean_iterations`` / ``max_iterations``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, List

import jax

__all__ = ["trace", "timed", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a JAX profiler trace of the enclosed region into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, reps: int = 1, **kwargs):
    """Run ``fn`` once for warmup/compile, then time ``reps`` calls.

    Returns ``(last_result, seconds_per_call)``. Blocks on the result each
    round so device work is fully attributed.
    """
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / max(reps, 1)


class StepTimer:
    """Wall-clock percentile tracker for a steady-state control loop."""

    def __init__(self) -> None:
        self._samples: List[float] = []
        self._t0: float | None = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        assert self._t0 is not None
        self._samples.append(time.perf_counter() - self._t0)
        self._t0 = None

    def _quantile(self, q: float) -> float:
        if not self._samples:
            return float("nan")
        s = sorted(self._samples)
        idx = min(int(q * (len(s) - 1) + 0.5), len(s) - 1)
        return s[idx]

    @property
    def count(self) -> int:
        return len(self._samples)

    def summary(self) -> dict:
        """p50/p95/max/mean step latency in milliseconds."""
        if not self._samples:
            return {"count": 0}
        return {
            "count": len(self._samples),
            "p50_ms": 1000.0 * self._quantile(0.5),
            "p95_ms": 1000.0 * self._quantile(0.95),
            "max_ms": 1000.0 * max(self._samples),
            "mean_ms": 1000.0 * sum(self._samples) / len(self._samples),
        }
