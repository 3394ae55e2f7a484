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
    background thread.  ``fn=None`` yields items unchanged.

    Abandoning the generator early (break / GC) stops the producer: a plain
    blocking ``q.put`` would park the thread forever on the full queue,
    pinning the last prepared item (host images AND its dispatched device
    buffers) for the process lifetime.
    """
    q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def produce():
        try:
            for item in iterable:
                if stop.is_set() or not put(
                        fn(item) if fn is not None else item):
                    return
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            put(_Raise(exc))
        finally:
            put(sentinel)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, _Raise):
                raise item.exc
            yield item
    finally:
        stop.set()
