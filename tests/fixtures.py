"""Synthetic KITTI fixture: a tiny on-disk dataset (images + labels + calib)
for data-layer and end-to-end tests (SURVEY.md §4a)."""

import os

import numpy as np


K_FIXED = np.array([[707.0493, 0.0, 604.0814],
                    [0.0, 707.0493, 180.5066],
                    [0.0, 0.0, 1.0]], dtype=np.float64)

T_SHIFT = np.array([44.857, 0.216, 0.0027])

IMG_W, IMG_H = 1242, 375


def _projected_bbox(dims, loc, ry):
    """2D box from projecting the 8 cuboid corners (independent math)."""
    h, w, l = dims
    # bottom-centered canonical corners
    xs = np.array([l, l, l, l, 0, 0, 0, 0]) - l / 2
    ys = np.array([0, h, 0, h, 0, h, 0, h]) - h
    zs = np.array([w, w, 0, 0, w, w, 0, 0]) - w / 2
    c, s = np.cos(ry), np.sin(ry)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    pts = R @ np.vstack([xs, ys, zs]) + np.asarray(loc).reshape(3, 1)
    pts = pts + (np.linalg.inv(K_FIXED) @ T_SHIFT).reshape(3, 1)
    proj = K_FIXED @ pts
    u = proj[0] / proj[2]
    v = proj[1] / proj[2]
    return (float(np.clip(u.min(), 0, IMG_W - 1)),
            float(np.clip(v.min(), 0, IMG_H - 1)),
            float(np.clip(u.max(), 0, IMG_W - 1)),
            float(np.clip(v.max(), 0, IMG_H - 1)))


def _rec(cls, alpha, dims, loc, ry, trunc=0.0, occ=0):
    return (cls, trunc, occ, alpha, _projected_bbox(dims, loc, ry),
            dims, loc, ry)


# (class, truncation, occlusion, alpha, bbox, (h, w, l), (x, y, z), ry)
CARS = [
    _rec("Car", -1.58, (1.48, 1.60, 3.69), (-2.11, 1.94, 13.4), -1.73),
    _rec("Car", 1.85, (1.50, 1.62, 3.88), (-8.1, 1.90, 19.3), 1.46, occ=0),
    _rec("Car", -1.65, (1.40, 1.51, 3.70), (2.4, 1.85, 21.2), -1.55, occ=1),
]
PEDS = [
    _rec("Pedestrian", 0.4, (1.78, 0.6, 0.9), (4.2, 1.7, 15.5), 0.6),
]


def _label_line(rec, score=None):
    cls, trunc, occ, alpha, bbox, dims, loc, ry = rec
    s = (f"{cls} {trunc:.2f} {occ} {alpha:.2f} "
         f"{bbox[0]:.2f} {bbox[1]:.2f} {bbox[2]:.2f} {bbox[3]:.2f} "
         f"{dims[0]:.2f} {dims[1]:.2f} {dims[2]:.2f} "
         f"{loc[0]:.2f} {loc[1]:.2f} {loc[2]:.2f} {ry:.2f}")
    if score is not None:
        s += f" {score:.4f}"
    return s


def make_kitti_root(tmpdir, n_images=2, with_predictions=False,
                    classes_per_image=None, seed=0, smooth=False):
    """Create a KITTI-layout directory with n_images synthetic frames.

    ``smooth`` renders low-frequency images (upsampled coarse noise) instead
    of per-pixel noise: cv2.warpAffine quantizes interpolation weights to
    5 bits, so bit-level crop agreement with the exact TPU warp is only
    achievable when neighboring pixels are close in value — required by the
    whole-pipeline differential test.

    Returns (root, prediction_dir or None).
    """
    import cv2

    root = os.path.join(str(tmpdir), "KITTI")
    img_dir = os.path.join(root, "training", "image_2")
    lbl_dir = os.path.join(root, "training", "label_2")
    cal_dir = os.path.join(root, "training", "calib")
    set_dir = os.path.join(root, "training", "ImageSets")
    for d in (img_dir, lbl_dir, cal_dir, set_dir):
        os.makedirs(d, exist_ok=True)

    rng = np.random.RandomState(seed)
    names = [f"{i:06d}" for i in range(n_images)]
    for i, name in enumerate(names):
        if smooth:
            low = rng.randint(0, 255, size=(IMG_H // 48 + 1, IMG_W // 48 + 1,
                                            3), dtype=np.uint8)
            img = cv2.resize(low, (IMG_W, IMG_H),
                             interpolation=cv2.INTER_CUBIC)
        else:
            img = rng.randint(0, 255, size=(IMG_H, IMG_W, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(img_dir, name + ".png"), img)
        recs = classes_per_image[i] if classes_per_image else CARS
        with open(os.path.join(lbl_dir, name + ".txt"), "w") as f:
            f.write("\n".join(_label_line(r) for r in recs) + "\n")
        p_line = "P2: " + " ".join(
            str(v) for v in np.hstack(
                [K_FIXED, T_SHIFT.reshape(3, 1)]).reshape(-1))
        with open(os.path.join(cal_dir, name + ".txt"), "w") as f:
            f.write("P0: " + " ".join(["0"] * 12) + "\n")
            f.write("P1: " + " ".join(["0"] * 12) + "\n")
            f.write(p_line + "\n")
            f.write("P3: " + " ".join(["0"] * 12) + "\n")

    half = max(1, n_images // 2)
    with open(os.path.join(set_dir, "train.txt"), "w") as f:
        f.write("\n".join(names[:half]) + "\n")
    with open(os.path.join(set_dir, "val.txt"), "w") as f:
        f.write("\n".join(names[half:] if n_images > 1 else names) + "\n")
    with open(os.path.join(set_dir, "trainval.txt"), "w") as f:
        f.write("\n".join(names) + "\n")

    pred_dir = None
    if with_predictions:
        pred_dir = os.path.join(str(tmpdir), "preds")
        os.makedirs(pred_dir, exist_ok=True)
        for i, name in enumerate(names):
            recs = classes_per_image[i] if classes_per_image else CARS
            with open(os.path.join(pred_dir, name + ".txt"), "w") as f:
                f.write("\n".join(
                    _label_line(r, score=0.9 - 0.1 * j)
                    for j, r in enumerate(recs)) + "\n")
    return root, pred_dir


def shrink_hrnet(cfg, num_blocks=1, num_modules=(1, 1, 1),
                 input_size=64, heatmap_size=16):
    """Scale an HRNet config down for fast tests (channels [8,16,32,64],
    tiny input/heatmap).  One shared helper — the same stanza was
    previously copy-pasted across six test files with accidental drift.
    Modifies ``cfg`` in place and returns it."""
    extra = cfg["heatmapModel"]["extra"]
    chans = {"stage2": [8, 16], "stage3": [8, 16, 32],
             "stage4": [8, 16, 32, 64]}
    for i, s in enumerate(("stage2", "stage3", "stage4")):
        extra[s].update({"num_channels": chans[s],
                         "num_blocks": [num_blocks] * len(chans[s]),
                         "num_modules": num_modules[i]})
    cfg["heatmapModel"]["input_size"] = [input_size, input_size]
    cfg["heatmapModel"]["heatmap_size"] = [heatmap_size, heatmap_size]
    return cfg
