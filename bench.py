"""Benchmark: end-to-end EgoNet inference throughput on one chip.

Measures instance-crops/sec through the FULL fused pipeline (device-side
affine crop -> HRNet-W48 coordinates -> inverse affine -> FC lifter ->
batched Kabsch SVD -> euler/alpha), bf16 compute, averaged over steady-state
iterations.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline target (BASELINE.md): >= 2000 instance-crops/sec/chip.
"""

import json
import os
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.models.egonet import EgoNet
    from egonet_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    cfgs = default_demo_config()
    # 384 is the measured single-chip sweet spot (3x128 MXU-aligned padded
    # batch; >=416 falls off a VMEM cliff)
    batch = int(os.environ.get("BENCH_BATCH", "384"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE",
                                           "bf16") == "bf16" else jnp.float32

    model = EgoNet(cfgs, pre_trained=False, dtype=dtype)

    rng = np.random.RandomState(0)
    n_img = 4
    images = rng.randint(0, 255, size=(n_img, 384, 1280, 3), dtype=np.uint8)
    # synthetic boxes spread over the canvas
    boxes = np.stack([
        np.array([x, y, x + w, y + h])
        for x, y, w, h in zip(rng.uniform(0, 900, batch),
                              rng.uniform(0, 200, batch),
                              rng.uniform(60, 300, batch),
                              rng.uniform(40, 150, batch))])
    from egonet_tpu.ops import affine
    width, height = model.resolution
    mats = affine.crop_matrices_for_boxes(boxes, (height, width),
                                          height / width, 1.1)
    inv_mats = jnp.asarray(mats["inv"].astype(np.float32))
    img_idx = jnp.asarray(rng.randint(0, n_img, batch).astype(np.int32))
    valid = jnp.ones(batch, jnp.float32)
    k_f = jnp.full((batch,), 707.0, jnp.float32)
    k_cx = jnp.full((batch,), 604.0, jnp.float32)
    ls = {k: jnp.asarray(v) for k, v in model.ls_stats.items()}
    images_d = jnp.asarray(images)

    fn = model._get_jitted("proj")

    def run():
        return fn(model.hrnet_vars, model.lifter_vars, ls, images_d,
                  inv_mats, img_idx, valid, k_f, k_cx)

    for _ in range(warmup):
        jax.block_until_ready(run())
    # synchronous per-call timing: on the tunneled platform,
    # block_until_ready returns early for queued work, so pipelined
    # dispatch measurements are unreliable — block every call
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(run())
    dt = (time.perf_counter() - t0) / iters
    crops_per_sec = batch / dt

    print(json.dumps({
        "metric": "instance_crops_per_sec_per_chip",
        "value": round(crops_per_sec, 1),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()
    # the tunneled TPU platform hangs at interpreter exit; force a clean one
    import sys
    sys.stdout.flush()
    os._exit(0)
