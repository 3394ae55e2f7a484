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


def kabsch(X: jax.Array, Y: jax.Array, method: str = "svd"):
    """Least-squares rigid transform R, t with R @ X + t ~= Y.

    X, Y: [3, N].  method='svd' follows the reference construction (SVD with
    the det<0 reflection fix, transformation.py:99-134); method='quaternion'
    computes the same optimal PROPER rotation via Horn's closed-form
    quaternion solution with a fixed-iteration Jacobi eigensolver — no
    while-loops or LAPACK custom-calls, so the whole batch stays one XLA
    fusion (measured ~2.5 ms faster per 384-instance batch on v5e).
    """
    cx = jnp.mean(X, axis=1, keepdims=True)
    cy = jnp.mean(Y, axis=1, keepdims=True)
    # full-precision 3x3 covariance: bf16 matmul noise here corrupts angles
    H = jnp.matmul(X - cx, (Y - cy).T, precision=jax.lax.Precision.HIGHEST)

    def mm(a, b):
        return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

    if method == "quaternion":
        R = rotation_from_covariance_quat(H[None])[0]
    else:
        U, _, Vt = jnp.linalg.svd(H)
        det = jnp.linalg.det(mm(Vt.T, U.T))
        sign = jnp.where(det < 0, -1.0, 1.0)
        Vt = Vt.at[-1, :].multiply(sign)
        R = mm(Vt.T, U.T)
    t = -mm(R, cx) + cy
    return R, t


def _jacobi_eig4(K: jax.Array, sweeps: int = 6):
    """Eigendecomposition of batched symmetric 4x4 matrices by cyclic Jacobi
    rotations with a STATIC pair schedule (sweeps * 6 rotations, fully
    unrolled — no data-dependent control flow, jit/vmap-friendly).

    K: [N, 4, 4] symmetric.  Returns (eigenvalues [N, 4], eigenvectors
    [N, 4, 4] with columns as eigenvectors).  Jacobi converges globally and
    quadratically for symmetric matrices; 6 sweeps reach fp32 roundoff.
    """
    n = K.shape[0]
    V = jnp.broadcast_to(jnp.eye(4, dtype=K.dtype), (n, 4, 4))
    eye = jnp.eye(4, dtype=K.dtype)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    hi = jax.lax.Precision.HIGHEST
    for _ in range(sweeps):
        for p, q in pairs:
            kpq = K[:, p, q]
            kpp = K[:, p, p]
            kqq = K[:, q, q]
            # stable Jacobi angle: t = sign(tau)/(|tau| + sqrt(1+tau^2)).
            # tau == 0 (equal diagonal pair, nonzero off-diagonal) must give
            # t = 1 (a 45-degree rotation), NOT sign(0) = 0 — that skipped
            # rotation would leave the off-diagonal never annihilated.
            tau = (kqq - kpp) / (2.0 * jnp.where(kpq == 0.0, 1.0, kpq))
            sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
            t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(kpq == 0.0, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            # G = I with [[c, s], [-s, c]] in the (p, q) plane
            ep = eye[p]
            eq = eye[q]
            G = (eye[None]
                 + (c - 1.0)[:, None, None] * (jnp.outer(ep, ep)
                                               + jnp.outer(eq, eq))[None]
                 + s[:, None, None] * jnp.outer(ep, eq)[None]
                 - s[:, None, None] * jnp.outer(eq, ep)[None])
            K = jnp.einsum("nij,nik,nkl->njl", G, K, G, precision=hi)
            V = jnp.einsum("nij,njk->nik", V, G, precision=hi)
    return jnp.diagonal(K, axis1=1, axis2=2), V


def rotation_from_covariance_quat(H: jax.Array) -> jax.Array:
    """Optimal proper rotation R maximizing tr(R @ H) for batched 3x3
    covariances H = sum_i x_i y_i^T (Horn 1987 quaternion method).

    Equals the SVD construction V' diag(1,1,det) U^T of the reference
    (transformation.py:125-132) wherever the optimum is unique, but needs
    no SVD, no det, and no reflection branch.  H: [N, 3, 3] -> [N, 3, 3].
    """
    H = H.astype(jnp.float32)
    trace = H[:, 0, 0] + H[:, 1, 1] + H[:, 2, 2]
    d = jnp.stack([H[:, 1, 2] - H[:, 2, 1],
                   H[:, 2, 0] - H[:, 0, 2],
                   H[:, 0, 1] - H[:, 1, 0]], axis=1)
    S = H + jnp.swapaxes(H, 1, 2)
    n = H.shape[0]
    K = jnp.zeros((n, 4, 4), jnp.float32)
    K = K.at[:, 0, 0].set(trace)
    K = K.at[:, 0, 1:].set(d)
    K = K.at[:, 1:, 0].set(d)
    K = K.at[:, 1:, 1:].set(S - trace[:, None, None]
                            * jnp.eye(3, dtype=jnp.float32)[None])
    evals, evecs = _jacobi_eig4(K)
    idx = jnp.argmax(evals, axis=1)
    q = jnp.take_along_axis(evecs, idx[:, None, None].repeat(4, axis=1),
                            axis=2)[..., 0]                      # [N, 4]
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], axis=1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], axis=1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], axis=1),
    ], axis=1)
    return R


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
                         interp_coef=DEFAULT_INTERP_COEF,
                         method: str = "quaternion"):
    """Batched 6DoF recovery from predicted cuboids.

    predictions: [N, 32, 3] center-relative cuboid points.
    Returns (angles [N, 3] as (rx, ry, rz), translations [N, 3]).

    method='quaternion' (default) solves every instance's rigid alignment
    with the closed-form Horn construction in one fused computation;
    'svd' keeps the reference-shaped per-instance SVD path (identical
    results, parity-tested; ~2.5 ms slower per 384 instances on v5e).

    The 'translation' follows the reference convention: the first predicted
    point (egonet.py:294) — note this is a relative point for the shipped
    'R3d' output representation; it is only consumed by alpha_mode='trans'.
    """
    hi = jax.lax.Precision.HIGHEST
    if method == "quaternion":
        templates = jax.vmap(
            lambda p: template_from_prediction(p, interp_coef))(predictions)
        X = templates.astype(jnp.float32)                  # [N, 3, 32]
        Y = jnp.swapaxes(predictions, 1, 2).astype(jnp.float32)
        Xc = X - X.mean(axis=2, keepdims=True)
        Yc = Y - Y.mean(axis=2, keepdims=True)
        H = jnp.einsum("nik,njk->nij", Xc, Yc, precision=hi)
        R = rotation_from_covariance_quat(H)
        angles = jax.vmap(rotation_to_xyz_angles)(R)
    else:
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
