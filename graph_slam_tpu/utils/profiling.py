"""Tracing / profiling hooks (SURVEY.md §5).

The reference's only observability is chi2 printed before/after optimize
(test_gt_graph.cpp:113-117) plus scattered ROS_INFO. Here:

- ``trace_context(dir)``: ``jax.profiler`` trace wrapper (degrades to a
  no-op when the profiler is unavailable on the backend);
- ``PhaseTimer``: per-phase wall-clock accumulation for host-driven
  pipelines (frontend / appends / optimize / io);
- ``Chi2Log``: structured per-update chi2 records the pipelines append to
  (the error-before/after pattern, machine-readable).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Optional

__all__ = ["trace_context", "PhaseTimer", "Chi2Log"]


@contextlib.contextmanager
def trace_context(trace_dir: Optional[str]):
    """jax.profiler.trace(trace_dir) when set and supported, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    # only guard profiler *startup* — an exception from the wrapped body
    # must propagate unchanged (wrapping the yield in try/except would
    # re-yield and mask it with contextlib's "generator didn't stop")
    try:
        ctx = jax.profiler.trace(trace_dir)
        ctx.__enter__()
    except Exception:   # profiler unsupported on this backend/build
        yield
        return
    try:
        yield
    finally:
        try:
            ctx.__exit__(None, None, None)
        except Exception:
            pass


class PhaseTimer:
    """Accumulating wall-clock phase timers.

    >>> pt = PhaseTimer()
    >>> with pt("optimize"): ...
    >>> pt.summary()   # {"optimize": {"calls": 1, "total_s": ...}}
    """

    def __init__(self):
        self._acc: dict[str, list] = {}

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            ent = self._acc.setdefault(phase, [0, 0.0])
            ent[0] += 1
            ent[1] += dt

    def summary(self) -> dict:
        return {k: {"calls": v[0], "total_s": round(v[1], 6),
                    "mean_ms": round(v[1] / max(v[0], 1) * 1e3, 3)}
                for k, v in self._acc.items()}


@dataclasses.dataclass
class Chi2Log:
    """Per-update chi2 records: (step, n_nodes, chi2_before, chi2_after)."""

    rows: list = dataclasses.field(default_factory=list)

    def add(self, step: int, n_nodes: int, before: Optional[float],
            after: float) -> None:
        self.rows.append((int(step), int(n_nodes),
                          None if before is None else float(before),
                          float(after)))

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            for r in self.rows:
                f.write(json.dumps({"step": r[0], "nodes": r[1],
                                    "chi2_before": r[2],
                                    "chi2_after": r[3]}) + "\n")
