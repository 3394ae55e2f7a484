"""Loss function tests: oracles are straight numpy re-derivations of the
reference formulas (heatmap MSE, coordinate L1, cross-ratio w/ masking)."""

import numpy as np
import jax.numpy as jnp
import pytest

from egonet_tpu.config import default_demo_config
from egonet_tpu.constants import CR_INDICES, TARGET_CROSS_RATIO
from egonet_tpu.ops.keypoints import (cross_ratio_sq, gaussian_targets,
                                      soft_argmax, hard_argmax)
from egonet_tpu.train import losses


def test_heatmap_mse_matches_torch_formula(rng):
    pred = rng.randn(3, 5, 8, 8).astype(np.float32)
    tgt = rng.randn(3, 5, 8, 8).astype(np.float32)
    got = float(losses.heatmap_mse_loss(jnp.asarray(pred), jnp.asarray(tgt)))
    # reference: sum over joints of 0.5*mean-MSE / num_joints == 0.5*mean
    expect = 0.5 * np.mean((pred - tgt) ** 2)
    assert abs(got - expect) < 1e-6


def test_heatmap_mse_respects_mask(rng):
    pred = rng.randn(4, 2, 4, 4).astype(np.float32)
    tgt = np.zeros_like(pred)
    mask = np.array([1, 1, 0, 0], np.float32)
    got = float(losses.heatmap_mse_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                        jnp.asarray(mask)))
    expect = 0.5 * np.mean(pred[:2] ** 2)
    assert abs(got - expect) < 1e-6


def test_coordinate_l1(rng):
    pred = rng.rand(2, 33, 2).astype(np.float32)
    gt = rng.uniform(0, 256, (2, 33, 2)).astype(np.float32)
    got = float(losses.coordinate_l1_loss(jnp.asarray(pred), jnp.asarray(gt),
                                          (256, 256)))
    expect = np.mean(np.abs(pred - gt / 256.0))
    assert abs(got - expect) < 1e-6


def _ref_appro_cr(coords):
    AC = coords[2] - coords[0]
    BD = coords[3] - coords[1]
    BC = coords[2] - coords[1]
    AD = coords[3] - coords[0]
    return (AC @ AC) * (BD @ BD) / ((BC @ BC) * (AD @ AD))


def test_cross_ratio_sq_matches_reference(rng):
    pts = rng.rand(7, 4, 2).astype(np.float64)
    got = np.asarray(cross_ratio_sq(jnp.asarray(pts)))
    for i in range(7):
        np.testing.assert_allclose(got[i], _ref_appro_cr(pts[i]), rtol=1e-5)


def test_cross_ratio_of_true_interpolation():
    """Points at [0, 0.332, 0.667, 1] have CR^2 ~= (4/3)^2 by construction."""
    t = np.array([0.0, 0.332, 0.667, 1.0])
    pts = np.stack([t, 2 * t], axis=1)[None]  # collinear
    got = float(cross_ratio_sq(jnp.asarray(pts))[0])
    assert abs(got - TARGET_CROSS_RATIO ** 2) < 2e-2


def test_cross_ratio_loss_small_for_perfect_projection(rng):
    """The projection of a real cuboid preserves each edge's cross-ratio, so
    the loss at the true keypoints should be small (the inner-product
    approximation and the 0.332/0.667 coefficients are themselves
    approximate, so 'small' rather than zero)."""
    from egonet_tpu.data import cuboid as cb
    box = cb.construct_box_3d(3.9, 1.5, 1.7, interpolate=True)
    rot = cb.rot_y_matrix(0.8)
    pts = (rot @ box + np.array([[1.0], [1.2], [12.0]])).T     # [33, 3]
    K = np.array([[700.0, 0, 600], [0, 700.0, 180], [0, 0, 1.0]])
    proj = cb.project_3d_to_2d(pts, K)[:2].T                   # [33, 2]
    # normalize into [0, 1] like the coordinate head output
    mins = proj.min(axis=0)
    span = (proj.max(axis=0) - mins).max()
    coords = ((proj - mins) / span).astype(np.float32)[None]
    loss_true = float(losses.cross_ratio_loss(jnp.asarray(coords)))
    # random coordinates violate the prior by a much larger margin
    coords_rand = rng.rand(1, 33, 2).astype(np.float32)
    loss_rand = float(losses.cross_ratio_loss(jnp.asarray(coords_rand)))
    assert loss_true < 5e-3
    assert loss_rand > 10 * loss_true


def test_cross_ratio_mask_drops_foreshortened(rng):
    coords = np.zeros((1, 33, 2), np.float32)  # all points identical
    loss = float(losses.cross_ratio_loss(jnp.asarray(coords)))
    assert loss == 0.0  # every edge masked -> zero, no NaN


def test_gaussian_targets_match_reference(rng):
    """Vectorized renderer vs the reference's paste-a-patch algorithm."""
    hm_hw = (16, 16)
    in_hw = (64.0, 64.0)
    sigma = 2
    joints = rng.uniform(-5, 70, size=(3, 6, 2))
    vis = (rng.rand(3, 6) > 0.2).astype(np.float64)

    got_t, got_w = gaussian_targets(jnp.asarray(joints), jnp.asarray(vis),
                                    hm_hw, in_hw, sigma)
    got_t, got_w = np.asarray(got_t), np.asarray(got_w)

    # reference-style oracle
    for n in range(3):
        for j in range(6):
            target = np.zeros(hm_hw, np.float32)
            weight = vis[n, j]
            if weight > 0.5:
                stride = in_hw[0] / hm_hw[0]
                mu_x = int(joints[n, j, 0] / stride + 0.5)
                mu_y = int(joints[n, j, 1] / stride + 0.5)
                tmp = sigma * 3
                ul = [mu_x - tmp, mu_y - tmp]
                br = [mu_x + tmp + 1, mu_y + tmp + 1]
                if (ul[0] >= hm_hw[1] or ul[1] >= hm_hw[0]
                        or br[0] < 0 or br[1] < 0):
                    weight = 0
                else:
                    size = 2 * tmp + 1
                    x = np.arange(size, dtype=np.float32)
                    y = x[:, None]
                    x0 = y0 = size // 2
                    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2)
                               / (2 * sigma ** 2))
                    gx = max(0, -ul[0]), min(br[0], hm_hw[1]) - ul[0]
                    gy = max(0, -ul[1]), min(br[1], hm_hw[0]) - ul[1]
                    ix = max(0, ul[0]), min(br[0], hm_hw[1])
                    iy = max(0, ul[1]), min(br[1], hm_hw[0])
                    target[iy[0]:iy[1], ix[0]:ix[1]] = \
                        g[gy[0]:gy[1], gx[0]:gx[1]]
            np.testing.assert_allclose(got_t[n, j], target, atol=1e-5,
                                       err_msg=f"n={n} j={j}")
            assert got_w[n, j] == weight


def test_soft_argmax_peak(rng):
    hm = np.full((1, 1, 32, 32), -5.0, np.float32)
    hm[0, 0, 10, 20] = 10.0
    coords, maxvals = soft_argmax(jnp.asarray(hm))
    assert abs(float(coords[0, 0, 0]) - 20) < 0.1
    assert abs(float(coords[0, 0, 1]) - 10) < 0.1
    assert abs(float(maxvals[0, 0, 0]) - 10.0) < 1e-6


def test_hard_argmax(rng):
    hm = rng.rand(2, 3, 8, 8).astype(np.float32)
    coords, maxvals = hard_argmax(jnp.asarray(hm))
    flat = hm.reshape(2, 3, -1)
    idx = flat.argmax(axis=2)
    np.testing.assert_array_equal(np.asarray(coords)[..., 0], idx % 8)
    np.testing.assert_array_equal(np.asarray(coords)[..., 1], idx // 8)


def test_composite_loss_config():
    cfg = default_demo_config()
    cfg["heatmapModel"]["loss_spec_list"] = ["mse", "l1", "sl1"]
    cfg["heatmapModel"]["loss_weight_list"] = [1.0, 0.1, "None"]
    lc = losses.CompositeLossConfig(cfg)
    assert lc.use_hm and lc.w_hm == 1.0
    assert lc.use_coor and lc.w_coor == 0.1
    assert not lc.use_cr  # weight "None" disables the term
    cfg["heatmapModel"]["loss_weight_list"] = [1.0, 0.1, 0.5]
    lc = losses.CompositeLossConfig(cfg)
    assert lc.use_cr and lc.w_cr == 0.5
