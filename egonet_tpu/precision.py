"""Precision-drift harness: quantify angle drift between two compute dtypes.

Runs the FULL fused inference pipeline (device warp -> HRNet-W48 ->
inverse affine -> FC lifter -> Kabsch SVD -> alpha) twice on identical
inputs — once per dtype — and reports ry/alpha deltas in degrees.

The lifter statistics are crafted so predictions land near a rotated
canonical cuboid (well-conditioned SVD, like trained weights produce),
instead of the degenerate point clouds raw random heads emit; HRNet drift
still propagates through the lifter input, so the measurement covers the
whole network depth.  Used by tests/test_precision.py (CPU) and
tools/precision_drift.py (real chip).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from egonet_tpu.data import cuboid as cb
from egonet_tpu.ops import affine


def _plausible_ls_stats() -> dict:
    """Lifter normalization stats that decode random-ish network outputs
    into near-canonical cuboids (geometry of a trained L.pth/LS.npy)."""
    box = cb.construct_box_3d(3.9, 1.5, 1.7, interpolate=True)   # [3, 33]
    rel = box[:, 1:] - box[:, :1]                                # center-rel
    rot = cb.rot_y_matrix(0.9)
    mean_out = (rot @ rel).T.reshape(1, -1).astype(np.float32)   # [1, 96]
    return {
        "mean_in": np.tile([600.0, 180.0], 33)[None].astype(np.float32),
        "std_in": np.full((1, 66), 150.0, np.float32),
        "mean_out": mean_out,
        "std_out": np.full((1, 96), 0.05, np.float32),
    }


def drift_harness(dtype_a, dtype_b, n_instances: int = 6,
                  seed: int = 0) -> dict:
    """Run the fused pipeline in two dtypes on identical inputs; return
    drift statistics (degrees)."""
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.models.egonet import EgoNet

    cfgs = default_demo_config()
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randint(0, 255, size=(1, 384, 1280, 3),
                                     dtype=np.uint8))
    x = rng.uniform(50, 900, n_instances)
    y = rng.uniform(30, 180, n_instances)
    boxes = np.stack([x, y, x + rng.uniform(80, 280, n_instances),
                      y + rng.uniform(50, 140, n_instances)], axis=1)

    def run(dtype):
        model = EgoNet(cfgs, pre_trained=False, dtype=dtype, rng_seed=seed)
        width, height = model.resolution
        mats = affine.crop_matrices_for_boxes(boxes, (height, width),
                                              height / width, 1.1)
        ls = {k: jnp.asarray(v) for k, v in _plausible_ls_stats().items()}
        from egonet_tpu.models.egonet import pack_meta
        meta = pack_meta(mats["inv"], np.zeros(n_instances),
                         np.ones(n_instances), 707.0, 604.0,
                         (images.shape[2], images.shape[1]))
        flat = np.asarray(model._get_jitted("proj")(
            model.hrnet_vars, model.lifter_vars, ls, images,
            jnp.asarray(meta)))
        # fused output columns (see EgoNet._tail): euler ry then alpha
        k2 = int(model.cfgs["heatmapModel"]["num_joints"]) * 2
        od = int(model.cfgs["FCModel"]["output_size"])
        return (np.asarray(flat[:, k2 + od + 1], np.float64),
                np.asarray(flat[:, -2], np.float64))

    ry_a, al_a = run(dtype_a)
    ry_b, al_b = run(dtype_b)

    def angdiff(a, b):
        d = np.abs(a - b)
        return np.degrees(np.minimum(d, 2 * np.pi - d))

    dry = angdiff(ry_a, ry_b)
    dal = angdiff(al_a, al_b)
    return {
        "median_dry_deg": float(np.median(dry)),
        "median_dalpha_deg": float(np.median(dal)),
        "max_dry_deg": float(dry.max()),
        "max_dalpha_deg": float(dal.max()),
        "n": n_instances,
    }
