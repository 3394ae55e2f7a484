"""Keypoint decoding (soft/hard argmax), Gaussian heatmap targets, and the
cross-ratio primitive — all as pure batched jnp ops.

Behavioural spec:
  * soft argmax (softmax-weighted expectation) ->
    /root/reference/libs/common/img_proc.py:678-707 (the torch version used
    in training; the numpy sum-normalized variant at :639-676 is exposed as
    ``soft_argmax_sumnorm``)
  * hard argmax -> img_proc.py:608-637
  * Gaussian targets -> img_proc.py:347-409 (vectorized here: the per-joint
    Python loop becomes one broadcasted expression)
  * cross-ratio approximation -> img_proc.py:709-720
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_argmax(heatmaps: jax.Array):
    """Softmax-weighted expected (x, y) per heatmap.

    heatmaps: [N, K, H, W].  Returns (coords [N, K, 2], maxvals [N, K, 1]).
    """
    n, k, h, w = heatmaps.shape
    flat = heatmaps.reshape(n, k, h * w)
    maxvals = jnp.max(flat, axis=2, keepdims=True)
    probs = jax.nn.softmax(flat, axis=2).reshape(n, k, h, w)
    xs = jnp.arange(w, dtype=heatmaps.dtype)
    ys = jnp.arange(h, dtype=heatmaps.dtype)
    x = jnp.sum(jnp.sum(probs, axis=2) * xs, axis=2)   # marginal over rows
    y = jnp.sum(jnp.sum(probs, axis=3) * ys, axis=2)   # marginal over cols
    return jnp.stack([x, y], axis=2), maxvals


def soft_argmax_sumnorm(heatmaps: jax.Array):
    """Sum-normalized (not softmax) soft argmax over UNCLIPPED activations.

    Mirrors the numpy variant used for evaluation-time decoding — including
    the reference's quirk that its negative-clip is dead code (see NOTE
    below).  Predictions whose max activation is <= 0 are zeroed like the
    reference.
    """
    n, k, h, w = heatmaps.shape
    flat = heatmaps.reshape(n, k, h * w)
    maxvals = jnp.max(flat, axis=2, keepdims=True)
    # NOTE: the reference clips a 4D *copy* to [0, inf) but then sums and
    # divides the unclipped 3D view (img_proc.py:656-659) — its clip is dead
    # code, so no clip is applied here either (parity over intent)
    probs = (flat / jnp.sum(flat, axis=2, keepdims=True)).reshape(n, k, h, w)
    xs = jnp.arange(w, dtype=heatmaps.dtype)
    ys = jnp.arange(h, dtype=heatmaps.dtype)
    x = jnp.sum(jnp.sum(probs, axis=2) * xs, axis=2)
    y = jnp.sum(jnp.sum(probs, axis=3) * ys, axis=2)
    coords = jnp.stack([x, y], axis=2)
    mask = (maxvals > 0.0).astype(coords.dtype)
    return coords * mask, maxvals


def hard_argmax(heatmaps: jax.Array):
    """Argmax (x, y) per heatmap with the (maxval > 0) validity mask."""
    n, k, h, w = heatmaps.shape
    flat = heatmaps.reshape(n, k, h * w)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2, keepdims=True)
    x = (idx % w).astype(heatmaps.dtype)
    y = jnp.floor(idx.astype(heatmaps.dtype) / w)
    coords = jnp.stack([x, y], axis=2)
    mask = (maxvals > 0.0).astype(coords.dtype)
    return coords * mask, maxvals


def gaussian_targets(joints: jax.Array,
                     joints_vis: jax.Array,
                     heatmap_hw,
                     input_hw,
                     sigma: float):
    """Render one Gaussian dot per joint, vectorized over (instance, joint).

    joints: [N, K, 2] local (input-resolution) coordinates.
    joints_vis: [N, K] visibility in {0, 1}.
    Returns (target [N, K, Hh, Wh], target_weight [N, K]).

    Semantics match the reference: the dot center is quantized to the
    heatmap grid (int(x/stride + 0.5)), the unnormalized Gaussian peaks at 1,
    and joints whose 3-sigma box misses the heatmap get weight 0.
    """
    hh, hw = int(heatmap_hw[0]), int(heatmap_hw[1])
    ih, iw = float(input_hw[0]), float(input_hw[1])
    stride_x = iw / hw
    stride_y = ih / hh
    tmp_size = sigma * 3

    # quantized centers: int(x/stride + 0.5) truncates toward zero, which
    # differs from floor for (slightly) negative jittered coordinates
    mu_x = jnp.trunc(joints[..., 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints[..., 1] / stride_y + 0.5)

    ul_x, ul_y = mu_x - tmp_size, mu_y - tmp_size
    br_x, br_y = mu_x + tmp_size + 1, mu_y + tmp_size + 1
    in_bounds = ~((ul_x >= hw) | (ul_y >= hh) | (br_x < 0) | (br_y < 0))
    weight = joints_vis * in_bounds.astype(joints.dtype)

    xs = jnp.arange(hw, dtype=joints.dtype)
    ys = jnp.arange(hh, dtype=joints.dtype)
    dx2 = (xs[None, None, :] - mu_x[..., None]) ** 2          # [N, K, Wh]
    dy2 = (ys[None, None, :] - mu_y[..., None]) ** 2          # [N, K, Hh]
    gx = jnp.exp(-dx2 / (2.0 * sigma ** 2))
    gy = jnp.exp(-dy2 / (2.0 * sigma ** 2))
    # zero out beyond the 3-sigma window exactly like the pasted patch
    gx = jnp.where(dx2 <= tmp_size ** 2, gx, 0.0)
    gy = jnp.where(dy2 <= tmp_size ** 2, gy, 0.0)
    target = gy[..., :, None] * gx[..., None, :]               # [N, K, Hh, Wh]
    target = target * weight[..., None, None]
    return target, weight


def cross_ratio_sq(points: jax.Array) -> jax.Array:
    """Squared cross-ratio of 4 ordered 2D points via inner products.

    points: [..., 4, 2].  CR^2 = (|AC|^2 |BD|^2) / (|BC|^2 |AD|^2).
    """
    ac = points[..., 2, :] - points[..., 0, :]
    bd = points[..., 3, :] - points[..., 1, :]
    bc = points[..., 2, :] - points[..., 1, :]
    ad = points[..., 3, :] - points[..., 0, :]

    def sq(v):
        return jnp.sum(v * v, axis=-1)

    return (sq(ac) * sq(bd)) / (sq(bc) * sq(ad))
