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


def summarize_trace(log_dir: str, iters: int = 1) -> dict:
    """Aggregate a captured device trace by HLO category and fusion output
    shape (bandwidth included when the trace carries bytes_accessed).

    Reads the ``vm.trace.json.gz`` the TPU profiler writes under
    ``<log_dir>/plugins/profile/<run>/``.  ``iters``: how many identical
    steps the trace covers (durations are divided by it).

    Returns {'total_ms', 'by_category': [(name, ms)...],
    'by_shape': [(shape, ms, gb, gb_per_s)...], 'text': str}.
    """
    import collections
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    data = json.load(gzip.open(paths[-1]))
    dev = [e for e in data.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("args", {}).get("hlo_category")]
    total = sum(e["dur"] for e in dev) / iters
    by_cat: collections.Counter = collections.Counter()
    by_shape: collections.Counter = collections.Counter()
    by_bytes: collections.Counter = collections.Counter()
    for e in dev:
        by_cat[e["args"]["hlo_category"]] += e["dur"] / iters
        ln = e["args"].get("long_name", "")
        shape = ln.split(" = ")[1].split(" ")[0] if " = " in ln \
            else e["name"][:48]
        by_shape[shape] += e["dur"] / iters
        b = e["args"].get("bytes_accessed")
        if b:
            by_bytes[shape] += int(b) / iters

    lines = [f"device total: {total / 1e3:.1f} ms"]
    cats = by_cat.most_common()
    for c, d in cats:
        lines.append(f"  {c:30s} {d / 1e3:8.2f} ms")
    shapes = []
    lines.append("top fusion output shapes:")
    for s, d in by_shape.most_common(12):
        gb = by_bytes.get(s, 0) / 1e9
        bw = by_bytes.get(s, 0) / (d / 1e6) / 1e9 if d else 0.0
        shapes.append((s, d / 1e3, gb, bw))
        lines.append(f"  {s:52s} {d / 1e3:7.2f} ms {gb:7.2f} GB "
                     f"{bw:5.0f} GB/s")
    return {"total_ms": total / 1e3, "by_category": cats,
            "by_shape": shapes, "text": "\n".join(lines)}
