"""Producer-thread prefetch with exception propagation.

Shared by the training loader's prefetched epochs and the inference
streaming API: one place owns the queue/sentinel plumbing, and — unlike a
bare try/finally producer — an exception raised while preparing item k is
re-raised in the CONSUMER at position k instead of silently truncating the
stream (a mid-dataset decode error must fail the run, not skip the rest
with exit code 0).
"""

from __future__ import annotations

import queue as queue_mod
import threading


class _Raise:
    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_map(fn, iterable, depth: int = 2):
    """Yield ``fn(item)`` for each item, computed ``depth`` ahead in a
    background thread.  ``fn=None`` yields items unchanged."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
    sentinel = object()

    def produce():
        try:
            for item in iterable:
                q.put(fn(item) if fn is not None else item)
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            q.put(_Raise(exc))
        finally:
            q.put(sentinel)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            break
        if isinstance(item, _Raise):
            raise item.exc
        yield item
