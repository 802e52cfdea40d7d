"""Tracing / profiling hooks.

The reference has no tracer — wall time is a ``time.time()`` difference with
tracking time subtracted (base.py:238-239,315-316; SURVEY §5). Here:

- ``phase_timer``: nestable named phase timing collected into a dict that the
  driver logs as metrics (setup/solve/analysis/plots breakdown);
- ``device_trace``: context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace directory (works on TPU and CPU);
- throughput accounting: ``timesteps_per_sec`` computed from the runner's
  iteration count and wall time and logged alongside wall_time_seconds.
"""

from __future__ import annotations

import contextlib
import logging
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

log = logging.getLogger(__name__)

__all__ = ["PhaseTimer", "device_trace"]


class PhaseTimer:
    """Collects named wall-time phases; ``as_metrics()`` for tracking."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.time() - t0

    def as_metrics(self, prefix: str = "time_") -> Dict[str, float]:
        return {f"{prefix}{k}_seconds": round(v, 4)
                for k, v in self.phases.items()}


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    Path(trace_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.profiler.start_trace(str(trace_dir))
        started = True
    except Exception as exc:  # tracing must never kill a run
        log.warning("Device tracing failed to start: %s", exc)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                log.info("Wrote device trace to %s", trace_dir)
            except Exception as exc:
                log.warning("Device tracing failed to stop: %s", exc)
