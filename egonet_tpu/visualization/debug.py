"""Training debug artifacts: image grids with predicted/GT joints and
heatmap grids.

Functional equivalents of /root/reference/libs/visualization/debug.py
(save_batch_image_with_joints :51-81, save_batch_heatmaps :83-149,
save_debug_images :151-189) over NHWC numpy batches.
"""

from __future__ import annotations

import math
import os

import numpy as np

from egonet_tpu.constants import IMAGENET_MEAN, IMAGENET_STD


def _denormalize(crops: np.ndarray, mean=None, std=None,
                 scale: float = 255.0) -> np.ndarray:
    """Normalized crops -> uint8 RGB.  Extra channels beyond the first 3
    (the add_xy coordinate maps) are dropped; mean/std default to the
    ImageNet values but must follow dataset.pth_transform when set.
    ``scale`` is the divisor the pipeline applied before normalizing
    (constants.crop_scale_divisor: 1.0 under add_xy, else 255.0)."""
    crops = np.asarray(crops)[..., :3]
    mean = IMAGENET_MEAN if mean is None else np.asarray(mean, np.float32)
    std = IMAGENET_STD if std is None else np.asarray(std, np.float32)
    # 5-entry pth_transform stats (the reference add_xy recipe) carry xy
    # entries the RGB channels must not see
    img = crops * std[:3] + mean[:3]
    return np.clip(img * scale, 0, 255).astype(np.uint8)


def save_batch_image_with_joints(crops, joints, joints_vis, path,
                                 nrow: int = 8, radius: int = 2,
                                 norm_stats=None, scale: float = 255.0):
    """Grid of crops with joint dots burned in.

    crops: [N, H, W, 3+] normalized; joints: [N, K, 2] local pixel coords.
    """
    import cv2
    imgs = _denormalize(np.asarray(crops), *(norm_stats or (None, None)),
                        scale=scale)
    n, h, w = imgs.shape[:3]
    ncol = min(nrow, n)
    nr = math.ceil(n / ncol)
    grid = np.zeros((nr * h, ncol * w, 3), np.uint8)
    for i in range(n):
        img = imgs[i].copy()
        for k in range(joints.shape[1]):
            if joints_vis is None or joints_vis[i][k] > 0:
                x, y = int(joints[i, k, 0]), int(joints[i, k, 1])
                if 0 <= x < w and 0 <= y < h:
                    cv2.circle(img, (x, y), radius, (0, 255, 0), -1)
        r, c = divmod(i, ncol)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    return path


def save_batch_heatmaps(crops, heatmaps, path, norm_stats=None,
                        scale: float = 255.0):
    """Per-instance row: [resized crop | per-joint colorized heatmaps]."""
    import cv2
    imgs = _denormalize(np.asarray(crops), *(norm_stats or (None, None)),
                        scale=scale)
    hms = np.asarray(heatmaps)
    n, k, hh, hw = hms.shape
    rows = []
    for i in range(n):
        small = cv2.resize(imgs[i], (hw, hh))
        cells = [small]
        for j in range(k):
            hm = hms[i, j]
            hm = np.clip(hm, 0, None)
            maxv = hm.max() if hm.max() > 0 else 1.0
            hm8 = (hm / maxv * 255).astype(np.uint8)
            colored = cv2.applyColorMap(hm8, cv2.COLORMAP_JET)
            colored = cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)
            cells.append((colored * 0.7 + small * 0.3).astype(np.uint8))
        rows.append(np.concatenate(cells, axis=1))
    grid = np.concatenate(rows, axis=0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    return path


def save_debug_images(cfgs, crops, joints_gt, joints_pred, targets,
                      outputs, prefix):
    """Dispatcher gated by training_settings.debug flags (ref :151-189)."""
    debug = cfgs.get("training_settings", {}).get("debug", {})
    if not debug.get("save", False):
        return []
    from egonet_tpu.constants import crop_scale_divisor, norm_stats
    stats = norm_stats(cfgs)
    scale = crop_scale_divisor(cfgs)   # 1.0 under add_xy (0-255 crops)
    written = []
    if debug.get("save_images_kpts", False) and joints_pred is not None:
        written.append(save_batch_image_with_joints(
            crops, joints_pred, None, f"{prefix}_pred.jpg",
            norm_stats=stats, scale=scale))
        if joints_gt is not None:
            written.append(save_batch_image_with_joints(
                crops, joints_gt[..., :2],
                joints_gt[..., 2] if joints_gt.shape[-1] > 2 else None,
                f"{prefix}_gt.jpg", norm_stats=stats, scale=scale))
    if debug.get("save_hms_gt", False) and targets is not None:
        written.append(save_batch_heatmaps(crops, targets,
                                           f"{prefix}_hm_gt.jpg",
                                           norm_stats=stats, scale=scale))
    if debug.get("save_hms_pred", False) and outputs is not None:
        written.append(save_batch_heatmaps(crops, outputs,
                                           f"{prefix}_hm_pred.jpg",
                                           norm_stats=stats, scale=scale))
    return written
