"""Batched, jit-friendly orientation recovery: template fit, Kabsch rigid
alignment, euler extraction and observation-angle computation.

This module replaces the reference's per-instance NumPy/SciPy loop
(/root/reference/libs/model/egonet.py:203-295 together with
/root/reference/libs/common/transformation.py:99-134) with vmapped jnp ops:
the whole batch of predicted cuboids is aligned in one XLA computation.

Conventions reproduced:
  * weighted Kabsch with reflection fix (transformation.py:99-134),
  * euler order: scipy ``Rotation.as_euler('yxz')`` (extrinsic y-x-z, i.e.
    R = Rz(c) @ Rx(b) @ Ry(a)), reordered to (rx, ry, rz) (egonet.py:265-277),
  * template h/l/w estimated by averaging the 4 parallel edges per dimension
    (egonet.py:238-263),
  * alpha = ry - atan2(-z, x) - pi/2 wrapped to [-pi, pi] (egonet.py:203-236).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from egonet_tpu.constants import INTERP_DICT, DEFAULT_INTERP_COEF

# 0-based (parent, child) corner indices of the 12 edges within the 32-point
# center-relative prediction (corners occupy slots 0..7).
_EDGE_P = jnp.asarray(INTERP_DICT["bbox12"][0] - 1)
_EDGE_C = jnp.asarray(INTERP_DICT["bbox12"][1] - 1)


def template_from_prediction(pred: jax.Array,
                             interp_coef=DEFAULT_INTERP_COEF) -> jax.Array:
    """Canonical (zero-rotation) cuboid template sized like the prediction.

    pred: [32, 3] center-relative cuboid points (8 corners + 24 interpolated).
    Returns [3, 32] template points.
    """
    parents = pred[_EDGE_P]
    children = pred[_EDGE_C]
    lines = jnp.sqrt(jnp.sum((parents - children) ** 2, axis=1))
    h = jnp.sum(lines[0:4]) / 4.0
    l = jnp.sum(lines[4:8]) / 4.0
    w = jnp.sum(lines[8:12]) / 4.0

    zeros = jnp.zeros(())
    x_corners = jnp.stack([l, l, l, l, zeros, zeros, zeros, zeros]) - l / 2.0
    y_corners = jnp.stack([zeros, h, zeros, h, zeros, h, zeros, h]) - h
    z_corners = jnp.stack([w, w, zeros, zeros, w, w, zeros, zeros]) - w / 2.0
    corners = jnp.stack([x_corners, y_corners, z_corners])       # [3, 8]

    p = corners[:, _EDGE_P]
    c = corners[:, _EDGE_C]
    lines3 = c - p
    new_pts = [p + coef * lines3 for coef in interp_coef]        # each [3, 12]
    return jnp.concatenate([corners] + new_pts, axis=1)          # [3, 32]


def kabsch(X: jax.Array, Y: jax.Array):
    """Least-squares rigid transform R, t with R @ X + t ~= Y.

    X, Y: [3, N].  SVD-based with the reflection fix (det(R) < 0 flips the
    last right-singular vector).
    """
    cx = jnp.mean(X, axis=1, keepdims=True)
    cy = jnp.mean(Y, axis=1, keepdims=True)
    # full-precision 3x3 covariance: bf16 matmul noise here corrupts angles
    H = jnp.matmul(X - cx, (Y - cy).T, precision=jax.lax.Precision.HIGHEST)
    U, _, Vt = jnp.linalg.svd(H)

    def mm(a, b):
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

    det = jnp.linalg.det(mm(Vt.T, U.T))
    sign = jnp.where(det < 0, -1.0, 1.0)
    Vt = Vt.at[-1, :].multiply(sign)
    R = mm(Vt.T, U.T)
    t = -mm(R, cx) + cy
    return R, t


def euler_yxz(R: jax.Array) -> jax.Array:
    """Angles (a, b, c) with R = Rz(c) @ Rx(b) @ Ry(a).

    Matches scipy ``Rotation.from_matrix(R).as_euler('yxz')`` away from the
    gimbal-lock singularity (|R[2,1]| = 1).  Returns [a, b, c] = [y, x, z].
    """
    b = jnp.arcsin(jnp.clip(R[2, 1], -1.0, 1.0))
    a = jnp.arctan2(-R[2, 0], R[2, 2])
    c = jnp.arctan2(-R[0, 1], R[1, 1])
    return jnp.stack([a, b, c])


def rotation_to_xyz_angles(R: jax.Array) -> jax.Array:
    """(rx, ry, rz) ordering used by the KITTI emission path (egonet.py:274-277)."""
    ayxz = euler_yxz(R)
    return jnp.stack([ayxz[1], ayxz[0], ayxz[2]])


def six_dof_from_cuboids(predictions: jax.Array,
                         interp_coef=DEFAULT_INTERP_COEF):
    """Batched 6DoF recovery from predicted cuboids.

    predictions: [N, 32, 3] center-relative cuboid points.
    Returns (angles [N, 3] as (rx, ry, rz), translations [N, 3]).

    The 'translation' follows the reference convention: the first predicted
    point (egonet.py:294) — note this is a relative point for the shipped
    'R3d' output representation; it is only consumed by alpha_mode='trans'.
    """
    def one(pred):
        template = template_from_prediction(pred, interp_coef)
        R, _ = kabsch(template, pred.T)
        return rotation_to_xyz_angles(R)

    angles = jax.vmap(one)(predictions)
    translations = predictions[:, 0, :]
    return angles, translations


def wrap_to_pi(a: jax.Array) -> jax.Array:
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def observation_angle_trans(ry: jax.Array, translations: jax.Array) -> jax.Array:
    """alpha from known 3D location: ry - atan2(-z, x) - pi/2."""
    x3d = translations[:, 0]
    z3d = translations[:, 2]
    return wrap_to_pi(ry - jnp.arctan2(-z3d, x3d) - 0.5 * jnp.pi)


def observation_angle_proj(ry: jax.Array,
                           kpts_x: jax.Array,
                           f: jax.Array,
                           cx: jax.Array) -> jax.Array:
    """alpha from the image-plane projection of the object center.

    kpts_x: [N] x screen coordinate of the first (center) keypoint.
    """
    x3d = kpts_x - cx
    z3d = jnp.broadcast_to(f, x3d.shape)
    return wrap_to_pi(ry - jnp.arctan2(-z3d, x3d) - 0.5 * jnp.pi)
