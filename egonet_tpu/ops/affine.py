"""Affine crop math and the device-side warp.

The host half reproduces the center/scale/rotation affine convention of the
reference preprocessing kernel library (behavioural spec:
/root/reference/libs/common/img_proc.py:26-105 — ``get_affine_transform`` /
``affine_transform`` / cv2.warpAffine crops), without cv2: the 2x3 matrix is
recovered from the same 3-point correspondence with a linear solve.

The device half replaces the per-instance ``cv2.warpAffine`` Python loop with
a single vmapped bilinear sampler: one XLA program warps every instance crop
of a batch directly on TPU (zero-padding border semantics identical to
cv2.BORDER_CONSTANT with value 0).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from egonet_tpu.constants import SIZE, crop_scale_divisor, norm_stats


# ---------------------------------------------------------------------------
# Host-side (NumPy) affine-matrix construction
# ---------------------------------------------------------------------------

def _rotate_2d(point, rot_rad: float):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array([point[0] * cs - point[1] * sn,
                     point[0] * sn + point[1] * cs], dtype=np.float64)


def _third_point(a, b):
    """Complete a right-angle triangle: rotate (a-b) by 90 deg around b."""
    d = a - b
    return b + np.array([-d[1], d[0]], dtype=np.float64)


def _solve_affine(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """2x3 affine matrix mapping three src points onto three dst points."""
    # A @ [x, y, 1]^T = [x', y']^T for each of the 3 correspondences.
    ones = np.ones((3, 1), dtype=np.float64)
    src_h = np.hstack([src.astype(np.float64), ones])          # [3, 3]
    # Solve src_h @ M^T = dst  ->  M^T = src_h^-1 @ dst
    m_t = np.linalg.solve(src_h, dst.astype(np.float64))        # [3, 2]
    return m_t.T                                                # [2, 3]


def get_affine_transform(center,
                         scale,
                         rot: float,
                         output_size,
                         shift=(0.0, 0.0),
                         inv: bool = False) -> np.ndarray:
    """Affine matrix for a center/scale/rotation crop.

    Args:
      center: (x, y) crop center in source-image pixels.
      scale:  (sx, sy) crop scale; the crop covers ``scale * SIZE`` source px.
      rot:    rotation in degrees.
      output_size: (height, width) of the destination patch.
      shift:  normalized shift of the crop center (fraction of scale*SIZE).
      inv:    if True, return the inverse mapping (patch -> source).

    Returns: float64 [2, 3] matrix.
    """
    center = np.asarray(center, dtype=np.float64).reshape(2)
    scale = np.asarray(scale, dtype=np.float64).reshape(2)
    shift = np.asarray(shift, dtype=np.float64).reshape(2)

    scale_tmp = scale * SIZE
    src_w = scale_tmp[0]
    dst_h, dst_w = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * rot / 180.0
    src_dir = _rotate_2d([0.0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0.0, dst_w * -0.5], dtype=np.float64)

    src = np.zeros((3, 2), dtype=np.float64)
    dst = np.zeros((3, 2), dtype=np.float64)
    src[0] = center + scale_tmp * shift
    src[1] = center + src_dir + scale_tmp * shift
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    src[2] = _third_point(src[0], src[1])
    dst[2] = _third_point(dst[0], dst[1])

    if inv:
        return _solve_affine(dst, src)
    return _solve_affine(src, dst)


def affine_transform_pts(pts: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Apply a [2, 3] affine matrix to [N, 2] points (host-side)."""
    pts = np.asarray(pts, dtype=np.float64)
    return pts @ t[:, :2].T + t[:, 2]


def transform_preds(coords: np.ndarray, center, scale, output_size):
    """Local patch coordinates -> source-image coordinates (host-side;
    spec img_proc.py:16-24)."""
    trans = get_affine_transform(center, scale, 0, output_size, inv=True)
    return affine_transform_pts(np.asarray(coords)[:, :2], trans)


def simple_crop(image: np.ndarray, center, crop_size) -> np.ndarray:
    """Rectangular crop around ``center`` with zero padding outside the
    image (host-side; spec img_proc.py:107-135)."""
    assert image.ndim == 3
    sx = int(center[0] - crop_size[0])
    ex = int(center[0] + crop_size[0])
    sy = int(center[1] - crop_size[1])
    ey = int(center[1] + crop_size[1])
    out = np.zeros((ey - sy, ex - sx, image.shape[2]), dtype=image.dtype)
    nsx, nex = max(-sx, 0), min(image.shape[1], ex) - sx
    nsy, ney = max(-sy, 0), min(image.shape[0], ey) - sy
    osx, oex = max(sx, 0), min(ex, image.shape[1])
    osy, oey = max(sy, 0), min(ey, image.shape[0])
    out[nsy:ney, nsx:nex] = image[osy:oey, osx:oex]
    return out


def generate_xy_map(bbox, resolution, global_size) -> np.ndarray:
    """Normalized [-1, 1] coordinate channels for a crop region (the add_xy
    input augmentation; spec img_proc.py:193-211).  resolution is
    (width, height); global_size is (height, width)."""
    map_w, map_h = int(resolution[0]), int(resolution[1])
    g_h, g_w = global_size
    xs = np.linspace(2 * bbox[0] / g_w - 1, 2 * bbox[2] / g_w - 1, map_w)
    ys = np.linspace(2 * bbox[1] / g_h - 1, 2 * bbox[3] / g_h - 1, map_h)
    x_map = np.tile(xs, (map_h, 1))[..., None]
    y_map = np.tile(ys[:, None], (1, map_w))[..., None]
    return np.concatenate([x_map, y_map], axis=2)


# ---------------------------------------------------------------------------
# Bounding-box <-> center/scale conversions (host-side, tiny)
# ---------------------------------------------------------------------------

def resize_bbox(left, top, right, bottom, target_ar: float = 1.0) -> dict:
    """Expand a box (never shrink) to the target aspect ratio (h/w).

    Spec: /root/reference/libs/common/img_proc.py:411-435.
    """
    width = right - left
    height = bottom - top
    aspect_ratio = height / width
    cx = (left + right) / 2.0
    cy = (top + bottom) / 2.0
    if aspect_ratio > target_ar:
        new_w = height / target_ar
        bbox = [cx - 0.5 * new_w, top, cx + 0.5 * new_w, bottom]
    else:
        new_h = width * target_ar
        bbox = [left, cy - 0.5 * new_h, right, cy + 0.5 * new_h]
    return {
        "bbox": bbox,
        "c": np.array([cx, cy]),
        "s": np.array([(bbox[2] - bbox[0]) / SIZE, (bbox[3] - bbox[1]) / SIZE]),
    }


def enlarge_bbox(left, top, right, bottom, enlarge) -> list:
    w = (right - left) * enlarge[0]
    h = (bottom - top) * enlarge[1]
    cx = (left + right) / 2.0
    cy = (top + bottom) / 2.0
    return [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h]


def modify_bbox(bbox, target_ar: float, enlarge: float = 1.1) -> dict:
    """Enlarge then aspect-ratio-fix a detection box (crop definition used at
    inference; spec /root/reference/libs/common/img_proc.py:453-459)."""
    l = enlarge_bbox(bbox[0], bbox[1], bbox[2], bbox[3], [enlarge, enlarge])
    return resize_bbox(l[0], l[1], l[2], l[3], target_ar=target_ar)


def cs2bbox(center, size):
    return [center[0] - size[0], center[1] - size[1],
            center[0] + size[0], center[1] + size[1]]


def resize_crop(crop_size, target_ar=None):
    if target_ar is None:
        return crop_size
    width, height = crop_size[0], crop_size[1]
    if height / width > target_ar:
        return [height / target_ar, height]
    return [width, width * target_ar]


def kpts2cs(keypoints: np.ndarray,
            enlarge: float = 1.1,
            method: str = "boundary",
            target_ar=None,
            use_visibility: bool = True):
    """Tight crop center/half-size from instance keypoints.

    Spec: /root/reference/libs/common/img_proc.py:495-540.
    Returns (center, crop_half_size, shifted_keypoints, visible_rate).
    """
    assert keypoints.shape[1] in (2, 3)
    if keypoints.shape[1] == 2:
        visible = keypoints
        visible_idx = np.arange(len(keypoints))
        vis_rate = 1.0
    elif use_visibility:
        visible_idx = keypoints[:, 2].nonzero()[0]
        visible = keypoints[visible_idx, :2]
        vis_rate = len(visible) / len(keypoints)
    else:
        visible = keypoints[:, :2]
        visible_idx = np.arange(len(keypoints))
        vis_rate = 1.0

    if method == "centroid":
        center = np.ceil(visible.mean(axis=0, keepdims=True))
        dif = np.abs(visible - center).max(axis=0, keepdims=True)
        crop_size = np.ceil(dif * enlarge).squeeze()
        center = center.squeeze()
    elif method == "boundary":
        lt = visible.min(axis=0, keepdims=True)
        rb = visible.max(axis=0, keepdims=True)
        center = ((lt + rb) / 2.0).squeeze()
        crop_size = ((rb - lt) * enlarge / 2.0).squeeze()
    else:
        raise NotImplementedError(method)

    crop_size = resize_crop(crop_size, target_ar)
    x1, y1, _, _ = cs2bbox(center, crop_size)
    origin = np.array([[x1, y1]], dtype=keypoints.dtype)
    new_keypoints = keypoints.copy()
    if keypoints.shape[1] == 2:
        new_keypoints = visible - origin
    else:
        new_keypoints[visible_idx, :2] = visible - origin
    return center, crop_size, new_keypoints, vis_rate


def crop_matrices_for_boxes(boxes: np.ndarray,
                            output_size,
                            target_ar: float,
                            enlarge: float = 1.1):
    """Forward+inverse affine matrices for a stack of detection boxes.

    Fully-vectorized host prep for the device warp (~60 ms/384 boxes as a
    Python loop, <1 ms vectorized — load-bearing for end-to-end throughput).
    For the rot=0, shift=0 crops of the inference pipeline the 3-point
    affine construction (img_proc.py:26-64) reduces in closed form to a
    uniform scale k = dst_w / (s_x * SIZE) about the box center:
        M = [[k, 0, dw/2 - k*cx], [0, k, dh/2 - k*cy]]
    (both axes scale by dst_width/src_width because the reference derives
    the third correspondence point from the width direction only).

    Returns dict with 'fwd' [N,2,3], 'inv' [N,2,3], 'center' [N,2],
    'scale' [N,2], 'bbox_resize' [N,4].
    """
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    n = len(boxes)
    dst_h, dst_w = float(output_size[0]), float(output_size[1])

    # enlarge_bbox (img_proc.py:437-451)
    w = (boxes[:, 2] - boxes[:, 0]) * enlarge
    h = (boxes[:, 3] - boxes[:, 1]) * enlarge
    cx = 0.5 * (boxes[:, 0] + boxes[:, 2])
    cy = 0.5 * (boxes[:, 1] + boxes[:, 3])

    # resize_bbox to the target aspect ratio, never shrinking
    # (img_proc.py:411-435)
    ar = h / w
    taller = ar > target_ar
    new_w = np.where(taller, h / target_ar, w)
    new_h = np.where(taller, h, w * target_ar)
    rbs = np.stack([cx - 0.5 * new_w, cy - 0.5 * new_h,
                    cx + 0.5 * new_w, cy + 0.5 * new_h], axis=1)
    scales = np.stack([new_w / SIZE, new_h / SIZE], axis=1)
    centers = np.stack([cx, cy], axis=1)

    # closed-form rot=0 affine (parity-tested against the 3-point solve)
    k = dst_w / new_w
    fwd = np.zeros((n, 2, 3))
    fwd[:, 0, 0] = k
    fwd[:, 1, 1] = k
    fwd[:, 0, 2] = dst_w * 0.5 - k * cx
    fwd[:, 1, 2] = dst_h * 0.5 - k * cy
    ki = new_w / dst_w
    inv = np.zeros((n, 2, 3))
    inv[:, 0, 0] = ki
    inv[:, 1, 1] = ki
    inv[:, 0, 2] = cx - ki * dst_w * 0.5
    inv[:, 1, 2] = cy - ki * dst_h * 0.5
    return {
        "fwd": fwd,
        "inv": inv,
        "center": centers,
        "scale": scales,
        "bbox_resize": rbs,
    }


def save_cropped_patches(img_path: str, keypoints, save_dir: str = "./",
                         threshold: float = 0.25, enlarge: float = 1.4,
                         target_ar=None):
    """Crop instance patches around keypoints and save them (the optional
    pre-processing workflow; spec img_proc.py:564-606).

    keypoints: [N_inst, K, 2 or 3].  Returns (paths, shifted_keypoints
    [N_kept, K, *], boxes).
    """
    import os
    import cv2
    img = cv2.imread(img_path, 1 | 128)
    if img is None:
        raise ValueError(f"Fail to read {img_path}")
    os.makedirs(save_dir, exist_ok=True)
    new_paths, all_new_kpts, all_bbox = [], [], []
    for i in range(len(keypoints)):
        center, crop_size, new_kpts, vis_rate = kpts2cs(
            keypoints[i], enlarge, target_ar=target_ar)
        all_bbox.append(list(map(int, cs2bbox(center, crop_size))))
        if vis_rate < threshold:
            continue
        all_new_kpts.append(new_kpts.reshape(1, *new_kpts.shape))
        cropped = simple_crop(img, center, crop_size)
        save_path = os.path.join(save_dir, f"instance_{i:d}.jpg")
        new_paths.append(save_path)
        cv2.imwrite(save_path, cropped)
    if not new_paths:
        k = keypoints.shape[1] if hasattr(keypoints, "shape") else 0
        return new_paths, np.zeros((0, k, 3)), all_bbox
    return new_paths, np.concatenate(all_new_kpts, axis=0), all_bbox


# ---------------------------------------------------------------------------
# Device-side warp (jnp, jit/vmap-friendly)
# ---------------------------------------------------------------------------

def warp_affine(image: jax.Array, inv_mat: jax.Array, out_hw) -> jax.Array:
    """Bilinear affine warp of one image on device.

    Args:
      image: [H, W, C] float array.
      inv_mat: [2, 3] matrix mapping destination pixel -> source pixel
               (i.e. ``get_affine_transform(..., inv=True)``).
      out_hw: static (height, width) of the output patch.

    Samples outside the source image contribute zero, matching
    cv2.warpAffine's default BORDER_CONSTANT(0) behaviour.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = image.shape[0], image.shape[1]

    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                     # [out_h, out_w]
    inv_mat = inv_mat.astype(jnp.float32)
    sx = inv_mat[0, 0] * gx + inv_mat[0, 1] * gy + inv_mat[0, 2]
    sy = inv_mat[1, 0] * gx + inv_mat[1, 1] * gy + inv_mat[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = image[yc, xc]                           # [out_h, out_w, C]
        return vals * valid[..., None].astype(image.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    wx = wx[..., None].astype(image.dtype)
    wy = wy[..., None].astype(image.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _interp_weights(start: jax.Array, step: jax.Array, n_out: int,
                    n_src: int, dtype=jnp.float32,
                    offset: jax.Array | None = None) -> jax.Array:
    """Linear-interpolation weight matrix for a 1-D affine resample.

    Output sample i reads source coordinate ``start + step*i``; entry
    [i, v] is the bilinear hat weight max(0, 1 - |coord_i - v|).  Out-of-
    range coordinates get all-zero rows — identical to BORDER_CONSTANT(0).

    ``offset`` (ROI packing) is an INTEGER-valued translation ADDED to the
    source indices, not subtracted from the coordinates: integer+integer
    sums below 2^24 are exact in fp32, so entry [i, u] computes the very
    same ``|coords_i - v|`` subtraction (v = u + offset) the un-offset
    full-canvas weights compute — packed WEIGHTS are bit-identical to the
    full-canvas weights.  (Subtracting from ``coords`` instead would round
    whenever the shift grows the magnitude.)  The warp outputs still agree
    only to 1 fp32 ulp: the second matmul pass multiplies bf16 weights by
    full-precision f32 row sums — inexact products whose FMA/reduction
    association XLA picks per shape.
    Returns [n_out, n_src].
    """
    coords = start + step * jnp.arange(n_out, dtype=jnp.float32)
    src = jnp.arange(n_src, dtype=jnp.float32)
    if offset is not None:
        src = src + offset
    d = jnp.abs(coords[:, None] - src[None])
    return jnp.maximum(0.0, 1.0 - d).astype(dtype)


def warp_affine_separable(images: jax.Array,
                          inv_mats: jax.Array,
                          img_idx: jax.Array,
                          out_hw,
                          dtype=jnp.float32) -> jax.Array:
    """Axis-aligned (rotation-free) affine warp as two batched matmuls.

    TPU-native formulation: arbitrary-gather bilinear sampling is ~100x
    slower than matrix math on TPU, but every EgoNet crop is an axis-aligned
    scale+translate (rotation is 0 throughout the reference pipeline), so
    bilinear resampling factorizes into a row interpolation and a column
    interpolation — both MXU matmuls:

        out[n] = Ry[n] @ img[idx[n]] @ Rx[n]^T

    images: [B, H, W, C] (any real dtype); inv_mats: [N, 2, 3] axis-aligned
    patch->source affines; img_idx: [N].  Returns [N, out_h, out_w, C] in
    ``dtype`` (f32 default; pass bf16 to halve the warp's intermediate HBM
    traffic — the [N, out_h, W, C] row-pass tensor is ~1.5 GB/384-batch in
    f32 — with accumulation still f32 on the MXU).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    h, w = images.shape[1], images.shape[2]
    imgs_f = images.astype(jnp.float32)

    # single-pass bf16 on the MXU: ~0.4% weight rounding, finer than
    # cv2.warpAffine's own 5-bit (1/32) fixed-point interpolation weights.
    # Weights are materialized directly in bf16 (halves the construction
    # bandwidth of the [N, out, src] hat-weight tensors).
    precision = jax.lax.Precision.DEFAULT

    def one(mat, idx):
        mat = mat.astype(jnp.float32)
        ry = _interp_weights(mat[1, 2], mat[1, 1], out_h, h,
                             dtype=jnp.bfloat16)               # [out_h, H]
        rx = _interp_weights(mat[0, 2], mat[0, 0], out_w, w,
                             dtype=jnp.bfloat16)               # [out_w, W]
        img = imgs_f[idx]                                      # [H, W, C]
        # column pass FIRST: the [H, out_w, C] intermediate is 3.3x
        # smaller than row-first's [out_h, W, C] on the 384x1280 canvas
        # (~1.3 ms/384-batch of HBM traffic saved; same math)
        tmp = jnp.einsum("xw,hwc->hxc", rx, img, precision=precision,
                         preferred_element_type=dtype)
        return jnp.einsum("yh,hxc->yxc", ry, tmp, precision=precision,
                          preferred_element_type=dtype)

    return jax.vmap(one)(inv_mats, img_idx)


def warp_affine_separable_windowed(canvas: jax.Array,
                                   inv_mats: jax.Array,
                                   offsets: jax.Array,
                                   win_y: jax.Array,
                                   out_hw,
                                   window_h: int,
                                   dtype=jnp.float32,
                                   *,
                                   bounds: jax.Array) -> jax.Array:
    """Separable warp over a ROI-packed canvas (see ops/packing.py).

    canvas: [Hp, Wp, C] packed footprints; inv_mats: [N, 2, 3] the ORIGINAL
    (source-coordinate) axis-aligned affines; offsets: [N, 2] integer-valued
    fp32 (x_off, y_off) mapping source coords into the canvas/window frame;
    win_y: [N] int32 window start rows; window_h: static window height
    covering the tallest footprint.

    Each instance reads only its [window_h, Wp] slice instead of a whole
    source frame — the packed warp moves FEWER bytes through HBM than the
    full-canvas warp as well as through the host->device link.  The
    interpolation weights are bit-identical to
    :func:`warp_affine_separable`'s (integer-offset construction, see
    ``_interp_weights``); outputs agree to 1 fp32 ulp (XLA's per-shape
    accumulation codegen is the only difference).

    ``bounds`` [N, 4] (x0, x1, y0, y1): valid-read ranges (x in canvas
    columns, y in window rows).  Slots hold only the IMAGE-clipped
    footprint; reads outside the source frame — zero-valued pixels in the
    full-canvas warp — become exact zero WEIGHTS here (integer
    comparisons), so edge-hanging boxes don't ship zero margins.  Required
    (keyword-only): ``packing.plan`` always image-clips its slots, so a
    boundless call over a packed canvas would silently sample a
    neighboring instance's pixels wherever a box hangs off its frame.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    wp = canvas.shape[1]
    canvas_f = canvas.astype(jnp.float32)
    precision = jax.lax.Precision.DEFAULT

    def one(mat, off, wy, bnd):
        mat = mat.astype(jnp.float32)
        win = jax.lax.dynamic_slice(
            canvas_f, (wy, 0, 0), (window_h, wp, canvas_f.shape[2]))
        ry = _interp_weights(mat[1, 2], mat[1, 1], out_h, window_h,
                             dtype=jnp.bfloat16, offset=off[1])
        rx = _interp_weights(mat[0, 2], mat[0, 0], out_w, wp,
                             dtype=jnp.bfloat16, offset=off[0])
        cols = jnp.arange(wp, dtype=jnp.float32)
        rows = jnp.arange(window_h, dtype=jnp.float32)
        rx = rx * ((cols >= bnd[0]) & (cols < bnd[1]))[None].astype(rx.dtype)
        ry = ry * ((rows >= bnd[2]) & (rows < bnd[3]))[None].astype(ry.dtype)
        tmp = jnp.einsum("xw,hwc->hxc", rx, win, precision=precision,
                         preferred_element_type=dtype)
        return jnp.einsum("yh,hxc->yxc", ry, tmp, precision=precision,
                          preferred_element_type=dtype)

    return jax.vmap(one)(inv_mats, offsets.astype(jnp.float32),
                         win_y.astype(jnp.int32),
                         bounds.astype(jnp.float32))


def warp_instances(image: jax.Array,
                   inv_mats: jax.Array,
                   out_hw,
                   mean: jax.Array | None = None,
                   std: jax.Array | None = None) -> jax.Array:
    """Warp+normalize a batch of instance crops from one source image.

    image: [H, W, 3] in [0, 1] float; inv_mats: [N, 2, 3].
    Returns [N, out_h, out_w, 3] crops, ImageNet-normalized when mean/std
    are given.  This is the device-side replacement for the reference's
    per-instance cv2.warpAffine loop (egonet.py:105-155).
    """
    crops = jax.vmap(lambda m: warp_affine(image, m, out_hw))(inv_mats)
    if mean is not None:
        crops = (crops - mean) / std
    return crops


def xy_maps_from_inv_mats(inv_mats: jax.Array, out_hw,
                          img_wh: jax.Array) -> jax.Array:
    """Device-side xy coordinate channels for a batch of crops (the
    ``add_xy`` 5-channel input augmentation).

    Reproduces ``generate_xy_map`` (spec img_proc.py:193-211): normalized
    [-1, 1] source-image coordinates linspaced INCLUSIVELY over the crop's
    modified bbox.  The bbox corners are recovered from the axis-aligned
    patch->source affines: x1 = inv[0, 2] (the source x of output column
    0), x2 = x1 + inv[0, 0] * out_w.

    inv_mats: [N, 2, 3]; img_wh: [N, 2] per-instance SOURCE image
    (width, height) — the true decoded size, not the padded canvas.
    Returns [N, out_h, out_w, 2] float32.
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    inv_mats = inv_mats.astype(jnp.float32)
    x1 = inv_mats[:, 0, 2]
    x2 = x1 + inv_mats[:, 0, 0] * out_w
    y1 = inv_mats[:, 1, 2]
    y2 = y1 + inv_mats[:, 1, 1] * out_h
    ramp_x = jnp.arange(out_w, dtype=jnp.float32) / (out_w - 1)   # [W]
    ramp_y = jnp.arange(out_h, dtype=jnp.float32) / (out_h - 1)   # [H]
    xs = x1[:, None] + (x2 - x1)[:, None] * ramp_x[None]          # [N, W]
    ys = y1[:, None] + (y2 - y1)[:, None] * ramp_y[None]          # [N, H]
    x_map = 2.0 * xs / img_wh[:, 0:1] - 1.0
    y_map = 2.0 * ys / img_wh[:, 1:2] - 1.0
    x_map = jnp.broadcast_to(x_map[:, None, :, None],
                             (len(inv_mats), out_h, out_w, 1))
    y_map = jnp.broadcast_to(y_map[:, :, None, None],
                             (len(inv_mats), out_h, out_w, 1))
    return jnp.concatenate([x_map, y_map], axis=-1)


def normalize_crop_patches(cfgs: dict, patches: jax.Array,
                           inv_mats: jax.Array | None,
                           img_wh: jax.Array | None, out_hw) -> jax.Array:
    """Warp output -> model input: round, scale, mean/std-normalize, and
    (for ``add_xy`` models) concatenate the xy coordinate channels.

    ONE implementation shared by the fused inference tail
    (models/egonet._tail), the IGR trainer and the angle trainer — the
    reference's checkpoint-compatibility quirks live here so the call
    sites can never drift:

      * ``constants.crop_scale_divisor``: add_xy models run 0-255-scale
        RGB through Normalize (the reference's float32 xy concat defeats
        ToTensor's /255 — spec egonet.py:91-95, img_proc.py:238-244);
      * ``dataset.pth_transform`` stats may carry 3 entries (RGB) or,
        with add_xy, the 5-entry RGB+xy set the reference configs keep
        commented out (KITTI_train_IGRs.yml:50-51): entries 3:5 normalize
        the coordinate channels after the concat, exactly like
        torchvision Normalize over the reference's 5-channel tensor.

    patches: [N, H, W, 3] warp output (any float dtype, 0-255 scale).
    inv_mats / img_wh are only read for add_xy models (required then).
    """
    add_xy = bool(((cfgs or {}).get("heatmapModel") or {}).get("add_xy"))
    mean, std = norm_stats(cfgs)
    if len(mean) != len(std):
        raise ValueError(
            f"pth_transform mean/std length mismatch: {len(mean)} vs "
            f"{len(std)}")
    if len(mean) not in (3, 5) or (len(mean) == 5 and not add_xy):
        raise ValueError(
            f"pth_transform stats have {len(mean)} entries; expected 3, "
            "or 5 with heatmapModel.add_xy enabled")
    mean = jnp.asarray(mean)
    std = jnp.asarray(std)
    div = crop_scale_divisor(cfgs)
    crops = (jnp.round(patches.astype(jnp.float32))
             / div - mean[:3]) / std[:3]                    # [N, H, W, 3]
    if add_xy:
        if inv_mats is None or img_wh is None:
            raise ValueError("add_xy models need inv_mats and img_wh")
        xy = xy_maps_from_inv_mats(inv_mats, out_hw, img_wh)
        if len(mean) == 5:
            xy = (xy - mean[3:]) / std[3:]
        crops = jnp.concatenate([crops, xy.astype(crops.dtype)],
                                axis=-1)                    # [N, H, W, 5]
    return crops


def batched_affine_transform(pts: jax.Array, mats: jax.Array) -> jax.Array:
    """Apply per-instance [2,3] affines to [N, K, 2] points on device.

    Geometry transforms always run at full fp32 precision: the default
    matmul precision on TPU is bf16, which costs ~0.5% coordinate error.
    """
    rot = jnp.einsum("nkj,nij->nki", pts, mats[:, :, :2],
                     precision=jax.lax.Precision.HIGHEST)
    return rot + mats[:, None, :, 2]
