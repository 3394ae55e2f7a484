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


def wrap_angle(a: float) -> float:
    return float(np.arctan2(np.sin(a), np.cos(a)))


def random_cars(rng, n=3, z_range=(8.0, 22.0)):
    """Randomized, non-overlapping car records with KITTI-consistent alpha
    (= ry - atan2(x, z)); z <= 22 m keeps boxes > 40 px tall, i.e. 'easy'
    difficulty for the evaluator."""
    recs = []
    # separated lateral slots so instances (and their drawn keypoints)
    # don't overlap in the image
    slots = np.linspace(-7.0, 7.0, n + 1)
    for i in range(n):
        dims = (rng.uniform(1.40, 1.60), rng.uniform(1.50, 1.70),
                rng.uniform(3.5, 4.2))                       # h, w, l
        x = rng.uniform(slots[i] + 1.0, slots[i + 1] - 1.0)
        z = rng.uniform(*z_range)
        y = 1.65 + rng.uniform(-0.05, 0.05)
        ry = rng.uniform(-np.pi, np.pi)
        alpha = wrap_angle(ry - np.arctan2(x, z))
        recs.append(_rec("Car", alpha, dims, (x, y, z), ry))
    return recs


def random_scene(rng, n_cars=2, n_peds=1, z_range=(8.0, 20.0),
                 ped_z_range=(7.0, 12.0)):
    """Randomized mixed Car+Pedestrian scene with KITTI-consistent alpha.
    Instances occupy disjoint lateral slots so their drawn keypoints never
    overlap; z <= 20 m keeps everything 'easy' difficulty (cars > 40 px,
    peds well above the 40 px min height gate).  Pedestrians get their own
    NEARER depth range: a 0.5-0.7 m-wide pedestrian at z = 20 m projects
    ~16 px wide, so its 33 keypoint dots alias into each other after the
    crop downscale and orientation becomes unrecoverable from pixels
    (measured: median ry error ~48 deg on far peds vs ~4 deg on cars) —
    the closed-loop fixtures must carry a RESOLVABLE geometry signal."""
    n = n_cars + n_peds
    recs = []
    slots = np.linspace(-7.0, 7.0, n + 1)
    order = rng.permutation(n)
    for i in range(n):
        is_car = order[i] < n_cars
        if is_car:
            dims = (rng.uniform(1.40, 1.60), rng.uniform(1.50, 1.70),
                    rng.uniform(3.5, 4.2))                    # h, w, l
        else:
            dims = (rng.uniform(1.65, 1.85), rng.uniform(0.5, 0.7),
                    rng.uniform(0.8, 1.0))
        x = rng.uniform(slots[i] + 1.0, slots[i + 1] - 1.0)
        z = rng.uniform(*(z_range if is_car else ped_z_range))
        y = 1.65 + rng.uniform(-0.05, 0.05)
        ry = rng.uniform(-np.pi, np.pi)
        alpha = wrap_angle(ry - np.arctan2(x, z))
        recs.append(_rec("Car" if is_car else "Pedestrian", alpha, dims,
                         (x, y, z), ry))
    return recs


def draw_instance_keypoints(img, recs, radius=None):
    """Render each instance's 33 projected cuboid keypoints as dots with a
    distinct color per keypoint index — a learnable visual signal for the
    trained-closed-loop test (the heatmap model can only recover geometry
    from pixels if the pixels carry it).  ``radius=None`` scales each
    instance's dots with its apparent size so they survive the crop's
    downscale to the model input (a fixed 2-3 px dot shrinks below one
    pixel for near instances and the task degenerates to memorization)."""
    import colorsys
    import cv2
    from egonet_tpu.data import cuboid as cb
    shift = (np.linalg.inv(K_FIXED) @ T_SHIFT).reshape(3, 1)
    for rec in recs:
        _cls, _t, _o, _a, bbox, (h, w, l), loc, ry = rec
        if radius is None:
            r = int(np.clip(round((bbox[3] - bbox[1]) / 24.0), 2, 8))
        else:
            r = radius
        pts = cb.construct_box_3d(l, h, w)                   # [3, 33]
        placed = cb.place_cuboid(pts, np.array([*loc, 0.0, ry, 0.0]), shift)
        proj = cb.project_3d_to_2d(placed, K_FIXED)          # [3, 33]
        for k in range(proj.shape[1]):
            u, v = int(round(proj[0, k])), int(round(proj[1, k]))
            if 0 <= u < IMG_W and 0 <= v < IMG_H:
                col = tuple(int(255 * c) for c in
                            colorsys.hsv_to_rgb(k / 33.0, 1.0, 1.0))
                cv2.circle(img, (u, v), r, col, -1)
    return img


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
                    classes_per_image=None, seed=0, smooth=False,
                    draw_keypoints=False):
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
        recs = classes_per_image[i] if classes_per_image else CARS
        if smooth:
            low = rng.randint(0, 255, size=(IMG_H // 48 + 1, IMG_W // 48 + 1,
                                            3), dtype=np.uint8)
            img = cv2.resize(low, (IMG_W, IMG_H),
                             interpolation=cv2.INTER_CUBIC)
        elif draw_keypoints:
            img = np.full((IMG_H, IMG_W, 3), 60, dtype=np.uint8)
            draw_instance_keypoints(img, recs)
        else:
            img = rng.randint(0, 255, size=(IMG_H, IMG_W, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(img_dir, name + ".png"), img)
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


# --------------------------------------------------------------------------
# Closed-loop gate world (shared between tests/test_closed_loop_gate.py and
# tools/make_gate_artifacts.py — the donor sidecars record zero-shot error on
# EXACTLY this fixture, so both sides must build it identically)
# --------------------------------------------------------------------------

GATE_SEED = 7          # donors trained on seed 3 — gate scenes are FRESH
GATE_N_IMAGES = 40     # 20 train / 20 valid


def make_gate_fixture(tmpdir):
    """The gate's synthetic world: 40 keypoint-rendered images, 2 cars +
    1 pedestrian each, with detector prediction txts (GT boxes + a score
    ladder).  Returns (root, pred_dir)."""
    rng = np.random.RandomState(GATE_SEED)
    scenes = [random_scene(rng, n_cars=2, n_peds=1)
              for _ in range(GATE_N_IMAGES)]
    return make_kitti_root(tmpdir, n_images=GATE_N_IMAGES,
                           with_predictions=True, classes_per_image=scenes,
                           draw_keypoints=True)


# Fine-tune LR for the closed-loop gate: the committed donors were trained
# to convergence THROUGH LR decay (milestones [90, 130] of 150 epochs, gamma
# 0.5 -> final LR 2.5e-4); fine-tuning them at the config's base LR (1e-3)
# kicks the weights out of the minimum and 6 epochs x 20 images cannot
# recover generalization (measured on the gate fixture: donor zero-shot val
# px 5.8 -> 29.8 after a 1e-3 fine-tune, vs 11.7 at 1e-4 — and the sharper
# two-class donor degrades 4.9 -> 19.8 even at 1e-4: ~24 Adam steps on 20
# images move a converged readout regardless).  The gate's fine-tune exists
# to prove the train step runs and stays converged, NOT to improve an
# already-converged donor, so it runs at 2e-5 — large enough that a broken
# train step still diverges loudly, small enough to keep the donor's
# generalization.  See docs/testing.md for the sweep.
GATE_FINETUNE_LR = 2e-5


def gate_train_stanza(cfg, lr=None):
    """The shared donor-training / gate-fine-tune recipe (single source of
    truth for tools/make_gate_artifacts.py and tests/test_closed_loop_gate.py
    — previously duplicated, ADVICE r4 #4).

    The crop-scale distribution is CENTERED BETWEEN the two product crop
    chains: the detector-submission path crops at 1.2 x 1.1 = 1.32x, the
    GT-box path at a fixed 1.1x (reference inference.py:154-164), and
    1.21 * [0.8, 1.2] = [0.97, 1.45] puts both at +-0.45 sigma.  Two
    measured dead ends (2026-08-19): centering on the submission chain
    (1.32, jitter 0.2 -> [1.06, 1.58]) leaves the GT path at the extreme
    tail and its ry flips on ~25% of instances (gate car/gt AOS ratio
    0.83); widening the jitter instead (1.32, jitter 0.3 -> [0.92, 1.72])
    costs too much precision at fixed epochs (donor zero-shot val px
    5.8 -> 11.0, native 13.8 -> 20.5, and every gate leg regressed).
    Modifies ``cfg`` in place and returns it.
    """
    cfg["dataset"]["enlarge_factor"] = 1.21
    cfg["heatmapModel"]["jitter_params"] = {"scaling": [0.2, 0.2],
                                            "shift": [0.05, 0.05]}
    cfg["optimizer"]["milestones"] = [100000]
    if lr is not None:
        cfg["optimizer"]["lr"] = lr
    cfg["training_settings"].update({"batch_size": 6, "total_epochs": 1})
    return cfg


GATE_NATIVE_SHRINK = dict(depths=(1, 1, 2), widths=(16, 32, 64),
                          head_width=48, grid_stride=8)


def gate_shrink(backbone):
    """The gate's per-family shrink recipe — single source of truth shared
    by tools/make_gate_artifacts.py (donor training + sidecar probe) and
    tests/test_closed_loop_gate.py (fine-tune + inference); the donor
    weights only fit the model the gate builds if both sides shrink
    identically."""
    if backbone == "hrnet":
        return shrink_hrnet
    return lambda cfg: shrink_tpu_native(cfg, **GATE_NATIVE_SHRINK)


def measure_donor_zero_shot(backbone, donor_path, root, classes=("Car",)):
    """Zero-shot val px error (JointDistance2DSIP mean, per ``classes``) of
    a committed donor on the gate fixture rooted at ``root``.

    This is the quantity the donor sidecars (tests/data/gate_*.json)
    record at regeneration time and the gate re-measures at setup
    (VERDICT r4 #8): a model/trainer change that silently degrades a donor
    fails the cheap forward-pass probe with a legible STALE-DONOR message
    instead of a mysterious AOS miss three stages later."""
    from egonet_tpu.config import load_config
    from egonet_tpu.data import kitti
    from egonet_tpu.io import checkpoint
    from egonet_tpu.train.igrs import IGRTrainer

    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")
    cfg = load_config(os.path.join(here, "KITTI_train_IGRs.yml"))
    cfg["dataset"]["root"] = root
    cfg["dataset"]["detect_classes"] = list(classes)
    gate_shrink(backbone)(cfg)
    cfg["heatmapModel"]["pretrained"] = donor_path
    cfg["heatmapModel"]["init_weights"] = True
    cfg["heatmapModel"]["extra"]["pretrained_layers"] = ["*"]
    gate_train_stanza(cfg)
    trainer = IGRTrainer(cfg, steps_per_epoch=1)
    variables = checkpoint.warm_start_variables(cfg, trainer.model)
    assert variables is not None, donor_path
    state = trainer.init_state(0, variables=variables)
    vs = kitti.KITTIDataset(cfg, "valid")
    ev = trainer.evaluate(state, vs.records)
    return float(ev.metrics[0].mean)


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


def shrink_tpu_native(cfg, depths=(1, 1, 1), widths=(8, 16, 32),
                      input_size=64, heatmap_size=16, head_width=8,
                      grid_stride=4):
    """Switch a config to a tiny PoseNetTPU (models/tpu_native.py) for
    fast tests.  Modifies ``cfg`` in place and returns it."""
    hm = cfg["heatmapModel"]
    hm["name"] = "tpu_native"
    hm["pretrained"] = ""
    hm["extra"] = {"depths": list(depths), "widths": list(widths),
                   "expansion": 2, "head_width": int(head_width),
                   "grid_stride": int(grid_stride)}
    hm["input_size"] = [input_size, input_size]
    hm["heatmap_size"] = [heatmap_size, heatmap_size]
    return cfg
