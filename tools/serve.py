"""Serve the fused EgoNet pipeline over HTTP with micro-batching.

TPU-native extension (the reference ships batch CLIs only): concurrent
single-image requests coalesce into the same fixed-shape instance buckets
the offline pipeline uses, so serving load reaches the accelerator as a
few large fused-program invocations.  See egonet_tpu/serving/server.py.

Usage:
  python tools/serve.py --cfg egonet_tpu/configs/KITTI_inference_demo.yml \
      [--host 127.0.0.1] [--port 8476] [--max-batch 16] [--max-wait-ms 10]

Then:
  curl -s localhost:8476/healthz
  curl -s -X POST localhost:8476/v1/pose -d '{"image_path": ".../000001.png",
       "boxes": [[446.9, 201.7, 545.7, 300.2]],
       "K": [[707.0, 0, 604.0], [0, 707.0, 180.0], [0, 0, 1]]}'
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(description="EgoNet-TPU pose server")
    parser.add_argument("--cfg", required=True, help="inference yaml")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8476)
    parser.add_argument("--max-batch", type=int, default=16,
                        help="images per micro-batch")
    parser.add_argument("--max-wait-ms", type=float, default=10.0,
                        help="max linger after the first queued request")
    parser.add_argument("--idle-floor", type=int, default=16,
                        help="instance bucket for uncongested micro-batches "
                             "(the 128 congestion floor applies under load); "
                             "0 always uses the 128 floor")
    parser.add_argument("--alpha-mode", default="proj",
                        choices=("proj", "trans"))
    parser.add_argument("--warmup", type=int, default=1,
                        help="1: compile the common bucket at boot so the "
                             "first request doesn't pay XLA compile")
    parser.add_argument("--devices", type=int, default=1,
                        help="shard each micro-batch's instance axis over "
                             "the first N chips (1-D data mesh; params and "
                             "packed canvases replicate, XLA runs the "
                             "collectives over ICI)")
    args = parser.parse_args(argv)

    import logging

    from egonet_tpu import config as cfg_mod
    from egonet_tpu.models.egonet import EgoNet
    from egonet_tpu.serving import PoseServer
    from egonet_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    cfgs = cfg_mod.load_config(args.cfg)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s")
    logger = logging.getLogger("egonet-serve")
    from egonet_tpu.utils.runtime import config_dtype
    mesh = None
    if args.devices > 1:
        import jax
        from egonet_tpu.parallel import mesh as pmesh
        avail = len(jax.devices())
        if args.devices > avail:
            parser.error(f"--devices {args.devices} requested but only "
                         f"{avail} device(s) visible")
        mesh = pmesh.make_mesh(args.devices)
        logger.info("sharding micro-batches over %d devices",
                    mesh.devices.size)
    # same checkpoint + precision policy as the batch CLI
    # (tools/inference.py): checkpoints load unless the config opts out
    model = EgoNet(cfgs, pre_trained=cfgs.get("pre_trained", True),
                   dtype=config_dtype(cfgs), mesh=mesh)

    server = PoseServer(model, host=args.host, port=args.port,
                        max_images=args.max_batch,
                        max_wait_ms=args.max_wait_ms,
                        alpha_mode=args.alpha_mode,
                        idle_floor=args.idle_floor).start()
    if args.warmup:
        logger.info("warmup: compiling the common bucket ...")
        server.warmup()
        logger.info("warmup done")
    logger.info("serving on http://%s:%d (micro-batch <= %d, linger %.1f ms)",
                args.host, server.port, args.max_batch, args.max_wait_ms)
    try:
        import threading
        threading.Event().wait()                     # run until interrupted
    except KeyboardInterrupt:
        logger.info("shutting down")
        server.stop()


if __name__ == "__main__":
    main()
    from egonet_tpu.utils.runtime import clean_exit
    clean_exit(0)
