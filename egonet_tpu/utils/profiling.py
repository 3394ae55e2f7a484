"""Profiling / tracing utilities.

The reference's closest artifacts are per-batch AverageMeter timing and a
FLOPs summary (SURVEY.md §5); here we add first-class jax.profiler traces
and a simple step timer for throughput lines.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto.

    No-op (with a warning) when the backend doesn't support profiling
    (e.g. tunneled devices)."""
    import jax
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # tunneled backends may not support profiling
        print(f"[egonet_tpu] profiler unavailable: {e}")
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class StepTimer:
    """Rolling per-step wall-clock statistics (samples/sec logging)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self.steps = 0
        self.total = 0.0

    def tick(self):
        now = time.perf_counter()
        if self._t0 is not None:
            self.total += now - self._t0
            self.steps += 1
        self._t0 = now

    def rate(self, items_per_step: int = 1) -> float:
        if not self.steps:
            return 0.0
        return items_per_step * self.steps / self.total
