"""Cuboid construction / rigid alignment / euler extraction vs scipy+numpy
oracles (SURVEY.md §4c: template fit and Kabsch SVD parity)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from egonet_tpu.constants import CR_INDICES, compute_cr_indices
from egonet_tpu.data import cuboid
from egonet_tpu.geometry import rigid


def test_cr_indices_table_consistent():
    np.testing.assert_array_equal(CR_INDICES, compute_cr_indices())


def test_construct_box_dimensions():
    box = cuboid.construct_box_3d(4.0, 1.5, 1.8, interpolate=False)
    assert box.shape == (3, 9)
    # center point is the bbox centroid shifted to bottom-center origin
    np.testing.assert_allclose(box[:, 0], [0.0, -0.75, 0.0], atol=1e-6)
    # corners span the l/h/w extents
    assert np.isclose(box[0].max() - box[0].min(), 4.0)
    assert np.isclose(box[1].max() - box[1].min(), 1.5)
    assert np.isclose(box[2].max() - box[2].min(), 1.8)


def test_interpolated_box_has_33_points():
    box = cuboid.construct_box_3d(4.0, 1.5, 1.8, interpolate=True)
    assert box.shape == (3, 33)
    # interpolated points sit on the segment between parent and child
    from egonet_tpu.constants import INTERP_DICT
    pidx, cidx = INTERP_DICT["bbox12"]
    for e in range(12):
        p = box[:, pidx[e]]
        c = box[:, cidx[e]]
        q1 = box[:, 9 + e]
        np.testing.assert_allclose(q1, p + 0.332 * (c - p), atol=1e-12)
        q2 = box[:, 9 + 12 + e]
        np.testing.assert_allclose(q2, p + 0.667 * (c - p), atol=1e-12)


def test_projection_roundtrip():
    K = np.array([[707.0, 0.0, 604.0], [0.0, 707.0, 180.0], [0.0, 0.0, 1.0]])
    pts = np.array([[1.0, 0.5, 10.0], [-2.0, 1.0, 20.0]])
    proj = cuboid.project_3d_to_2d(pts, K)
    assert proj.shape == (3, 2)
    np.testing.assert_allclose(proj[2], [10.0, 20.0])
    np.testing.assert_allclose(proj[0, 0], 604.0 + 707.0 * 1.0 / 10.0)


def test_visibility():
    joints = np.array([[10.0, 10.0], [-5.0, 10.0], [10.0, 400.0]])
    out = cuboid.add_visibility(joints, img_width=100, img_height=100)
    np.testing.assert_array_equal(out[:, 2], [1.0, 0.0, 0.0])


def test_kabsch_recovers_known_rotation(rng):
    for _ in range(10):
        R_true = Rotation.random(random_state=rng).as_matrix()
        t_true = rng.uniform(-5, 5, size=(3, 1))
        X = rng.uniform(-2, 2, size=(3, 20))
        Y = R_true @ X + t_true
        R, t = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)


def test_kabsch_reflection_fix(rng):
    # Degenerate/noisy case where an unconstrained solution would reflect:
    # the result must still be a proper rotation (det = +1).
    X = rng.uniform(-1, 1, size=(3, 4))
    Y = -X  # point inversion is not a rotation
    R, _ = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y))
    assert np.isclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_euler_yxz_matches_scipy(rng):
    for _ in range(50):
        R = Rotation.random(random_state=rng)
        expect = R.as_euler("yxz", degrees=False)
        got = np.asarray(rigid.euler_yxz(jnp.asarray(R.as_matrix())))
        np.testing.assert_allclose(got, expect, atol=1e-5)


def test_six_dof_recovers_yaw(rng):
    """Rotate a canonical cuboid by a known yaw; the pipeline recovers it."""
    box = cuboid.construct_box_3d(4.2, 1.6, 1.9, interpolate=True)
    # drop the center point -> 32 center-relative points, like the lifter out
    rel = (box[:, 1:] - box[:, :1])
    for ry in [-2.5, -1.0, 0.0, 0.3, 1.2, 3.0]:
        rot = cuboid.rot_y_matrix(ry)
        pred = (rot @ rel).T.reshape(1, 32, 3)
        angles, _ = rigid.six_dof_from_cuboids(jnp.asarray(pred))
        got = float(angles[0, 1])
        # compare on the circle
        diff = np.arctan2(np.sin(got - ry), np.cos(got - ry))
        assert abs(diff) < 1e-4, (ry, got)


def test_template_matches_reference_logic(rng):
    """Template h/l/w from averaged parallel edges, canonical corner layout."""
    box = cuboid.construct_box_3d(3.9, 1.4, 1.7, interpolate=True)
    rel = (box[:, 1:] - box[:, :1]).T  # [32, 3] canonical, zero-rotation
    template = np.asarray(rigid.template_from_prediction(jnp.asarray(rel)))
    # for a zero-rotation prediction the template equals the prediction up to
    # a translation: the template is bottom-anchored (y in [-h, 0]) while the
    # prediction is cuboid-center-relative.  Compare after centering.
    t_centered = template - template.mean(axis=1, keepdims=True)
    p_centered = rel.T - rel.T.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(t_centered, p_centered, atol=1e-5)


def test_alpha_wrap():
    ry = jnp.asarray([0.5, 3.0])
    trans = jnp.asarray([[10.0, 0.0, 20.0], [-5.0, 0.0, 15.0]])
    alphas = np.asarray(rigid.observation_angle_trans(ry, trans))
    import math
    for i, (r, t) in enumerate([(0.5, (10.0, 20.0)), (3.0, (-5.0, 15.0))]):
        a = r - math.atan2(-t[1], t[0]) - 0.5 * math.pi
        while a > math.pi:
            a -= 2 * math.pi
        while a < -math.pi:
            a += 2 * math.pi
        assert abs(alphas[i] - a) < 1e-6


def test_quaternion_kabsch_matches_svd_kabsch(rng):
    """Horn quaternion rotation == SVD+reflection-fix rotation, including
    det<0 (mirrored) covariances."""
    from egonet_tpu.geometry import rigid
    import jax.numpy as jnp
    for i in range(20):
        X = rng.randn(3, 32)
        Y = rng.randn(3, 32) if i % 2 else \
            0.5 * X + rng.randn(3, 1) + 0.2 * rng.randn(3, 32)
        R1, t1 = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y), "svd")
        R2, t2 = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y), "quaternion")
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), atol=1e-3)


def test_six_dof_quaternion_matches_svd(rng):
    """Batched angles agree between the fused quaternion path and the
    per-instance SVD path on realistic noisy cuboids."""
    from egonet_tpu.geometry import rigid
    from egonet_tpu.data import cuboid as cb
    import jax.numpy as jnp
    preds = []
    for i in range(16):
        box = cb.construct_box_3d(3.9 + 0.2 * rng.randn(), 1.5, 1.7,
                                  interpolate=True)
        rel = (box[:, 1:] - box[:, :1])
        rot = cb.rot_y_matrix(float(rng.uniform(-np.pi, np.pi)))
        preds.append((rot @ rel).T + 0.02 * rng.randn(32, 3))
    preds = jnp.asarray(np.stack(preds), jnp.float32)
    a_q, t_q = rigid.six_dof_from_cuboids(preds, method="quaternion")
    a_s, t_s = rigid.six_dof_from_cuboids(preds, method="svd")
    np.testing.assert_allclose(np.asarray(a_q), np.asarray(a_s), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(t_q), np.asarray(t_s))


def test_jacobi_eig4_degenerate_diagonal_pair():
    """Equal diagonal entries with a nonzero off-diagonal need a 45-degree
    Jacobi rotation (tau=0 -> t=1, not sign(0)=0): regression for a case
    where the [[2,1],[1,2]] block (eigenvalues 1 and 3) was returned
    unrotated as [2,2]."""
    from egonet_tpu.geometry.rigid import _jacobi_eig4
    import jax.numpy as jnp
    K = np.diag([5.0, 7.0, 2.0, 2.0])
    K[2, 3] = K[3, 2] = 1.0
    evals, evecs = _jacobi_eig4(jnp.asarray(K[None], jnp.float32))
    got = np.sort(np.asarray(evals[0]))
    np.testing.assert_allclose(got, [1.0, 3.0, 5.0, 7.0], atol=1e-5)
    # eigenvector property: K v = lambda v
    v = np.asarray(evecs[0])
    lam = np.asarray(evals[0])
    np.testing.assert_allclose(K @ v, v * lam, atol=1e-5)


def test_quaternion_kabsch_symmetric_covariance(rng):
    """Exactly-symmetric covariances (the tau=0 family) agree with the SVD
    construction."""
    from egonet_tpu.geometry import rigid
    import jax.numpy as jnp
    for d in ([3.0, 1.0, 1.0], [2.0, 2.0, 1.0], [1.0, 1.0, 1.0]):
        # X, Y chosen so H = diag(d) + symmetric perturbation
        X = rng.randn(3, 64)
        Y = np.diag(d) @ X
        R1, _ = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y), "svd")
        R2, _ = rigid.kabsch(jnp.asarray(X), jnp.asarray(Y), "quaternion")
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R1), atol=1e-4)
