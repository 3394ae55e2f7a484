"""Request-driven serving for the fused EgoNet pipeline.

The reference ships batch CLIs only; this is the TPU-native serving story
the batch design was built for.  Independent HTTP requests (one image +
its 2D detections each) are MICRO-BATCHED into the same fixed-shape
instance buckets the offline pipeline uses (models/egonet.py
``dispatch_annot_dict``), so concurrent load reaches the accelerator as a
few large fused-program invocations instead of many tiny ones — on an MXU
the difference between ~2,500 crops/s and per-request latency-bound
dribble.  Dispatch is asynchronous: while batch *i* computes on-device,
batch *i+1* assembles on host — the serving twin of the CLI's
dispatch/finalize pipelining.

No external dependencies: ``http.server`` + threads.  Endpoints:

  POST /v1/pose   {"image_b64": <base64 PNG/JPG>} or {"image_path": path},
                  "boxes": [[x1,y1,x2,y2], ...],
                  "K": [[fx,0,cx],[0,fy,cy],[0,0,1]]  (optional),
                  "score_threshold": float            (optional)
                  -> {"instances": [{"alpha", "rot_y", "euler_angles",
                      "translation", "kpts_2d", "kpts_3d"}, ...],
                      "batched_with": n_images_in_microbatch}
  GET  /healthz   liveness + device platform
  GET  /v1/stats  request/batch counters + model transport stats
"""

from __future__ import annotations

import base64
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class OverloadedError(RuntimeError):
    """Raised by submit() when the pending queue is at capacity — the
    HTTP layer maps it to 503 so callers can back off instead of piling
    unbounded work onto the batcher."""


class _Request:
    """One in-flight request: an image, its boxes, and a completion event."""

    __slots__ = ("key", "image", "boxes", "K", "event", "result", "error",
                 "batched_with")

    def __init__(self, key, image, boxes, K):
        self.key = key
        self.image = image
        self.boxes = boxes
        self.K = K
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.batched_with = 0


class MicroBatcher:
    """Groups concurrent requests into one fused-program dispatch.

    ``submit`` enqueues; a dispatch thread drains up to ``max_images``
    requests per micro-batch, waiting at most ``max_wait_ms`` after the
    first pending request before launching a partial batch (latency
    floor), and hands the ASYNC device dispatch to a finalize thread —
    keeping up to ``depth`` batches in flight.
    """

    def __init__(self, model, max_images: int = 16, max_wait_ms: float = 10.0,
                 depth: int = 2, enlarge: float = 1.1,
                 alpha_mode: str = "proj", max_queue: int = 256,
                 idle_floor: int = 16):
        self.model = model
        self.max_images = int(max_images)
        self.max_wait = float(max_wait_ms) / 1e3
        self.enlarge = float(enlarge)
        self.alpha_mode = alpha_mode
        self.max_queue = int(max_queue)
        # adaptive bucket floor (VERDICT r3 #5): an uncongested micro-batch
        # of <= idle_floor instances dispatches at this small pre-compiled
        # bucket instead of the 128 congestion floor — single-stream
        # latency drops by the ~50 ms of padded device compute, while the
        # program set stays at exactly two buckets per canvas shape
        # (idle_floor and 128).  0 disables (always 128).
        self.idle_floor = int(idle_floor)
        self.stats = {"requests": 0, "batches": 0, "instances": 0,
                      "empty_requests": 0, "idle_dispatches": 0,
                      "floor_dispatches": 0}
        self._lock = threading.Condition()
        self._queue: list[_Request] = []
        import queue
        self._inflight = queue.Queue(maxsize=max(1, int(depth)))
        self._stop = False
        self._threads = [
            threading.Thread(target=self._dispatch_loop, daemon=True,
                             name="egonet-serve-dispatch"),
            threading.Thread(target=self._finalize_loop, daemon=True,
                             name="egonet-serve-finalize"),
        ]
        for t in self._threads:
            t.start()

    # ---------------------------------------------------------------- API

    def submit(self, req: _Request):
        with self._lock:
            if self._stop:
                raise RuntimeError("batcher stopped")
            if len(self._queue) >= self.max_queue:
                self.stats["rejected"] = self.stats.get("rejected", 0) + 1
                raise OverloadedError(
                    f"queue full ({self.max_queue} pending)")
            self._queue.append(req)
            self.stats["requests"] += 1
            self._lock.notify_all()

    def close(self):
        with self._lock:
            self._stop = True
            self._lock.notify_all()
        # The dispatch loop emits the inflight sentinel itself AFTER
        # draining any queued batches; enqueuing one here would jump
        # ahead of in-flight work and strand those requests' events.
        for t in self._threads:
            t.join(timeout=5.0)

    # -------------------------------------------------------------- loops

    def _take_batch(self):
        """Block until requests exist, then drain a micro-batch."""
        with self._lock:
            while not self._queue and not self._stop:
                self._lock.wait()
            if self._stop and not self._queue:
                return None
            deadline = time.monotonic() + self.max_wait
            while (len(self._queue) < self.max_images and not self._stop):
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._lock.wait(timeout=remaining)
            batch = self._queue[:self.max_images]
            del self._queue[:len(batch)]
            # congestion signal for the adaptive bucket floor: more
            # requests already waiting behind this drain
            return batch, bool(self._queue)

    def _dispatch_loop(self):
        while True:
            taken = self._take_batch()
            if taken is None:
                self._inflight.put(None)
                return
            batch, congested = taken
            live = [r for r in batch if len(r.boxes)]
            for r in batch:
                if not len(r.boxes):
                    self.stats["empty_requests"] += 1
                    r.result = []
                    r.event.set()
            if not live:
                continue
            try:
                annot = {
                    "path": [r.key for r in live],
                    "images": [r.image for r in live],
                    "boxes": [np.asarray(r.boxes, np.float64)
                              for r in live],
                    "K": [r.K for r in live],
                }
                # serving packing profile: request-driven micro-batches
                # are ragged, so bound the XLA program count with geometric
                # canvas shapes (ops/packing.py shape-discipline note)
                n_inst = sum(len(r.boxes) for r in live)
                idle = (self.idle_floor > 0 and not congested
                        and n_inst <= self.idle_floor)
                pending = self.model.dispatch_annot_dict(
                    annot, enlarge=self.enlarge, alpha_mode=self.alpha_mode,
                    pack_profile="serving",
                    bucket_floor=self.idle_floor if idle else 128)
                self.stats["batches"] += 1
                self.stats["idle_dispatches" if idle
                           else "floor_dispatches"] += 1
                self.stats["instances"] += n_inst
                self._inflight.put((pending, live))
            except Exception as exc:                # noqa: BLE001
                for r in live:
                    r.error = exc
                    r.event.set()

    def _finalize_loop(self):
        while True:
            item = self._inflight.get()
            if item is None:
                return
            pending, live = item
            try:
                records = self.model.finalize(pending)
                for r in live:
                    rec = records[r.key]
                    r.result = _record_to_instances(rec)
                    r.batched_with = len(live)
                    r.event.set()
            except Exception as exc:                # noqa: BLE001
                for r in live:
                    r.error = exc
                    r.event.set()


def _record_to_instances(rec) -> list:
    euler = np.asarray(rec["euler_angles"], np.float64)
    alphas = np.asarray(rec["alphas"], np.float64)
    trans = np.asarray(rec["translation"], np.float64)
    k3d = np.asarray(rec["kpts_3d_pred"], np.float64)
    out = []
    for i in range(len(alphas)):
        k2d = np.asarray(rec["kpts_2d_pred"][i], np.float64).reshape(-1, 2)
        out.append({
            "alpha": float(alphas[i]),
            # rot_y convention matches the KITTI writer
            # (io/kitti_writer.py:43: euler_angles[:, 1])
            "rot_y": float(euler[i, 1]),
            "euler_angles": euler[i].tolist(),
            "translation": trans[i].tolist(),
            "kpts_2d": k2d.tolist(),
            "kpts_3d": k3d[i].tolist(),
        })
    return out


class PoseServer:
    """HTTP facade over :class:`MicroBatcher` (stdlib ThreadingHTTPServer:
    each request blocks its own handler thread on the batcher, so many
    concurrent posts coalesce into shared micro-batches)."""

    def __init__(self, model, host: str = "127.0.0.1", port: int = 0,
                 request_timeout_s: float = 600.0, **batcher_kwargs):
        # generous default: the FIRST request after boot pays the XLA
        # compile of the fused program for its bucket shape (minutes on a
        # cold cache); steady-state requests take milliseconds
        self.request_timeout_s = float(request_timeout_s)
        self.batcher = MicroBatcher(model, **batcher_kwargs)
        self._decode = model.load_image
        self._platform = "unknown"
        try:
            import jax
            self._platform = jax.devices()[0].platform
        except Exception:                           # noqa: BLE001
            pass
        self._counter = 0
        self._counter_lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):           # silence per-request spam
                pass

            def _json(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"ok": True,
                                     "platform": server._platform})
                elif self.path == "/v1/stats":
                    stats = dict(server.batcher.stats)
                    stats["transport"] = dict(
                        getattr(server.batcher.model, "transport_stats", {}))
                    self._json(200, stats)
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/v1/pose":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n))
                    t0 = time.monotonic()
                    req = server._build_request(payload)
                    try:
                        server.batcher.submit(req)
                    except OverloadedError as exc:
                        self._json(503, {"error": str(exc)})
                        return
                    if not req.event.wait(timeout=server.request_timeout_s):
                        self._json(504, {"error": "inference timed out"})
                        return
                    if req.error is not None:
                        self._json(500, {"error": str(req.error)})
                        return
                    self._json(200, {
                        "instances": req.result,
                        "batched_with": req.batched_with,
                        "latency_ms": round(
                            (time.monotonic() - t0) * 1e3, 2),
                    })
                except (ValueError, KeyError, IndexError,
                        TypeError) as exc:
                    # malformed payloads (incl. scores/boxes length
                    # mismatches) -> 400, never a dropped connection
                    self._json(400, {"error": str(exc)})
                except Exception as exc:  # e.g. submit() after close()
                    self._json(500, {"error": str(exc)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True,
            name="egonet-serve-http")

    def _build_request(self, payload: dict) -> _Request:
        if "image_b64" in payload:
            import cv2
            buf = np.frombuffer(base64.b64decode(payload["image_b64"]),
                                np.uint8)
            # IMREAD_IGNORE_ORIENTATION matches load_image's flags so an
            # EXIF-rotated JPEG decodes identically via either endpoint
            # (client boxes are in stored-pixel space on both).
            img = cv2.imdecode(
                buf, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
            if img is None:
                raise ValueError("image_b64 did not decode")
            img = img[:, :, ::-1].copy()            # BGR -> RGB, like load_image
        elif "image_path" in payload:
            img = self._decode(payload["image_path"])
        else:
            raise ValueError("need image_b64 or image_path")
        boxes = np.asarray(payload.get("boxes", []),
                           np.float64).reshape(-1, 4)
        thr = payload.get("score_threshold")
        scores = payload.get("scores")
        if thr is not None and scores is not None and len(boxes):
            boxes = boxes[np.asarray(scores, np.float64) >= float(thr)]
        K = np.asarray(payload["K"], np.float64) if "K" in payload \
            else np.eye(3)
        if K.shape != (3, 3):
            raise ValueError(f"K must be 3x3, got {K.shape}")
        with self._counter_lock:
            self._counter += 1
            key = f"req-{self._counter:08d}"
        return _Request(key, img, boxes, K)

    def warmup(self):
        """Dispatch synthetic KITTI-shaped requests so the fused programs
        for BOTH serving buckets — the idle floor and the 128 congestion
        floor — compile at boot instead of on user requests (XLA compiles
        once per shape; ops/packing.py quantizes canvas/window shapes so a
        steady workload settles on a few programs).  The second request
        carries idle_floor+1 boxes, which forces the 128-floor program
        even while the server is idle."""
        import numpy as np
        rng = np.random.RandomState(0)
        K = np.asarray([[707.0, 0, 604.0], [0, 707.0, 180.0], [0, 0, 1.0]])
        one_box = np.asarray([[500.0, 160.0, 620.0, 250.0]])
        idle_floor = self.batcher.idle_floor
        n_burst = (idle_floor + 1) if idle_floor > 0 else 1
        x0 = rng.uniform(0, 1000, n_burst)
        y0 = rng.uniform(0, 180, n_burst)
        burst = np.stack([x0, y0, x0 + rng.uniform(60, 240, n_burst),
                          y0 + rng.uniform(40, 160, n_burst)], axis=1)
        boxes_list = ([one_box, burst] if idle_floor > 0 else [one_box])
        for boxes in boxes_list:
            img = rng.randint(0, 255, (375, 1242, 3), np.uint8)
            req = _Request("warmup", img, boxes, K)
            self.batcher.submit(req)
            req.event.wait(timeout=self.request_timeout_s)
            if req.error is not None:
                raise req.error

    def start(self):
        self._serve_thread.start()
        return self

    def stop(self):
        # BaseServer.shutdown() BLOCKS until serve_forever() acknowledges —
        # forever, if start() was never called
        if self._serve_thread.is_alive():
            self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()
