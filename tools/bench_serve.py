"""Concurrent-load benchmark for the HTTP pose service.

Boots a PoseServer in-process on a synthetic KITTI-like workload and
fires N concurrent requests from a thread pool, printing ONE JSON line
with throughput and latency percentiles.  This reproduces the
measurement quoted in docs/performance.md (Serving): request arrivals
coalesce into shared micro-batches, so sustained throughput tracks the
fused program's batch rate, not per-request round trips.

Usage:
  python tools/bench_serve.py [--requests 128] [--boxes 6] [--workers 16]
      [--cfg egonet_tpu/configs/KITTI_inference_demo.yml]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_frames(root, n, seed=0):
    """Natural-entropy synthetic frames on disk (decode cost ~ real PNGs)."""
    import cv2
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"{i:06d}.png")
        if not os.path.exists(p):
            low = rng.randint(0, 255, (375 // 8, 1242 // 8, 3), np.uint8)
            cv2.imwrite(p, cv2.resize(low, (1242, 375),
                                      interpolation=cv2.INTER_CUBIC))
        paths.append(p)
    return paths


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg",
                    default="egonet_tpu/configs/KITTI_inference_demo.yml")
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--boxes", type=int, default=6, help="boxes per request")
    ap.add_argument("--workers", type=int, default=16,
                    help="concurrent client threads")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--max-wait-ms", type=float, default=80.0,
                    help="micro-batch linger: on a 1-core host request "
                         "decode serializes, so a short linger forms tiny "
                         "ragged batches (more shapes to compile, less MXU "
                         "amortization)")
    args = ap.parse_args(argv)

    from concurrent.futures import ThreadPoolExecutor
    import urllib.request

    from egonet_tpu import config as cfg_mod
    from egonet_tpu.models.egonet import EgoNet
    from egonet_tpu.serving import PoseServer
    from egonet_tpu.utils.runtime import config_dtype, enable_compilation_cache

    enable_compilation_cache()
    cfgs = cfg_mod.load_config(args.cfg)
    # random weights like bench.py: this measures transport + program
    # throughput, and the shipped demo config's checkpoints may be absent
    model = EgoNet(cfgs, pre_trained=False, dtype=config_dtype(cfgs))
    server = PoseServer(model, port=0, max_images=16,
                        max_wait_ms=args.max_wait_ms).start()
    server.warmup()

    paths = make_frames("/tmp/egonet_bench_serve", args.frames)
    rng = np.random.RandomState(1)
    K = [[707.0, 0, 604.0], [0, 707.0, 180.0], [0, 0, 1.0]]

    def payload(i):
        z = rng.uniform(5.0, 60.0, args.boxes)
        h = np.clip(707.0 * 1.5 / z, 22.0, 340.0)
        w = h * rng.uniform(1.2, 2.8, args.boxes)
        y1 = np.clip(185.0 - h * 0.5, 0, 374)
        x1 = rng.uniform(0, np.maximum(1242 - w, 1), args.boxes)
        boxes = np.stack([x1, y1, np.minimum(x1 + w, 1241.0),
                          np.minimum(y1 + h, 374.0)], 1)
        return {"image_path": paths[i % len(paths)],
                "boxes": boxes.tolist(), "K": K}

    payloads = [payload(i) for i in range(args.requests)]

    def fire(p):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/pose",
            data=json.dumps(p).encode())
        t0 = time.perf_counter()
        # retry transient socket drops: on this 1-core host the accept
        # queue can overflow under a 16-thread burst while the server
        # thread is inside a device dispatch, and the kernel resets the
        # connection — a client-visible hiccup, not a server failure.
        # The retried latency still counts from t0 (the client waited).
        for attempt in range(3):
            try:
                with urllib.request.urlopen(req, timeout=600) as resp:
                    body = json.loads(resp.read())
                break
            except (ConnectionResetError, ConnectionRefusedError) as e:
                if attempt == 2:
                    raise
                print(f"# retrying after {type(e).__name__}",
                      file=sys.stderr)
                time.sleep(0.2 * (attempt + 1))
        assert len(body["instances"]) == len(p["boxes"])
        return time.perf_counter() - t0

    # settle the shape set with untimed concurrent passes: ragged
    # micro-batches compile per novel (canvas_h, window_h, bucket) triple
    # (minutes each on this remote-compile rig), the serving packing
    # profile bounds — but does not eliminate — that set, and batch
    # composition varies pass to pass, so one pass rarely covers it.
    # Loop until a pass stops getting faster (no new compiles landed),
    # then time: steady state is what a long-lived server runs.
    def one_pass():
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.workers) as pool:
            ls = list(pool.map(fire, payloads))
        return time.perf_counter() - t0, ls

    prev = float("inf")
    for i in range(8):
        wall, lats = one_pass()
        print(f"# settle pass {i}: {wall:.1f} s", file=sys.stderr)
        if wall > 0.8 * prev:
            break
        prev = wall

    batches_before = server.batcher.stats["batches"]
    wall, lats = one_pass()
    lats_ms = np.sort(np.asarray(lats)) * 1e3
    stats = dict(server.batcher.stats)
    # report ONLY the timed pass's batch count: every other field
    # describes the timed pass, and requests-per-batch is the coalescing
    # rate readers derive from this line
    stats["batches"] -= batches_before

    # single-stream latency: sequential requests on an otherwise idle
    # server exercise the ADAPTIVE bucket floor (serving/server.py
    # idle_floor) — without it every lone request pays the 128-bucket's
    # padded device compute (~50 ms on-rig)
    idle_before = server.batcher.stats["idle_dispatches"]
    single = np.sort([fire(payloads[i % len(payloads)]) * 1e3
                      for i in range(12)])
    idle_used = server.batcher.stats["idle_dispatches"] - idle_before
    server.stop()
    print(json.dumps({
        "metric": "serve_requests_per_sec",
        "value": round(args.requests / wall, 2),
        "unit": "req/s",
        "requests": args.requests,
        "instances": args.requests * args.boxes,
        "workers": args.workers,
        "p50_ms": round(float(lats_ms[len(lats_ms) // 2]), 1),
        "p90_ms": round(float(lats_ms[int(len(lats_ms) * 0.9)]), 1),
        "max_ms": round(float(lats_ms[-1]), 1),
        "batches": stats["batches"],
        "single_stream_p50_ms": round(float(single[len(single) // 2]), 1),
        "single_stream_idle_dispatches": int(idle_used),
        "idle_floor": server.batcher.idle_floor,
    }))


if __name__ == "__main__":
    main()
    from egonet_tpu.utils.runtime import clean_exit
    clean_exit(0)
