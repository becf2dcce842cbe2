"""Tracing / profiling hooks (SURVEY §5: the reference has only wall-clock
timing in its pipelines, `pipeline_bids_register_evaluate.sh:245-253`; here we
expose jax.profiler traces plus structured step timing)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/XProf."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Rolling step timing with JSON-lines output (one record per step)."""

    path: str | None = None
    _t0: float = field(default=0.0, repr=False)
    records: list = field(default_factory=list)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, **labels) -> float:
        dt = time.perf_counter() - self._t0
        rec = {"seconds": dt, **labels}
        self.records.append(rec)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return dt

    def summary(self) -> dict:
        if not self.records:
            return {}
        xs = sorted(r["seconds"] for r in self.records)
        n = len(xs)
        return {
            "n": n,
            "mean": sum(xs) / n,
            "p50": xs[n // 2],
            "p90": xs[min(n - 1, int(0.9 * n))],
            "min": xs[0],
            "max": xs[-1],
        }
