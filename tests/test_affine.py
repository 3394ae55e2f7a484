"""Affine crop math vs cv2 oracles (numeric-parity tests, SURVEY.md §4c)."""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from egonet_tpu.ops import affine


def _ref_get_affine_transform(center, scale, rot, output_size,
                              shift=np.array([0, 0], dtype=np.float32),
                              inv=0):
    """cv2-based oracle re-deriving the reference construction."""
    SIZE = 200.0
    center = np.asarray(center, dtype=np.float32)
    scale = np.asarray(scale, dtype=np.float32)
    scale_tmp = scale * SIZE
    src_w = scale_tmp[0]
    dst_h, dst_w = output_size

    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_point = [0, src_w * -0.5]
    src_dir = np.array([src_point[0] * cs - src_point[1] * sn,
                        src_point[0] * sn + src_point[1] * cs])
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], dtype=np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2:, :] = third(src[0, :], src[1, :])
    dst[2:, :] = third(dst[0, :], dst[1, :])
    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


@pytest.mark.parametrize("rot", [0.0, 15.0, -30.0])
@pytest.mark.parametrize("inv", [0, 1])
def test_affine_matrix_matches_cv2(rot, inv, rng):
    for _ in range(10):
        center = rng.uniform(50, 500, size=2)
        scale = rng.uniform(0.2, 3.0, size=2)
        out_size = (256, 256)
        ours = affine.get_affine_transform(center, scale, rot, out_size,
                                           inv=bool(inv))
        ref = _ref_get_affine_transform(center, scale, rot, out_size, inv=inv)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_affine_inverse_consistency(rng):
    center = np.array([300.0, 120.0])
    scale = np.array([1.3, 1.3])
    fwd = affine.get_affine_transform(center, scale, 0.0, (256, 256))
    inv = affine.get_affine_transform(center, scale, 0.0, (256, 256), inv=True)
    pts = rng.uniform(0, 600, size=(20, 2))
    round_trip = affine.affine_transform_pts(
        affine.affine_transform_pts(pts, fwd), inv)
    np.testing.assert_allclose(round_trip, pts, atol=1e-6)


def test_modify_bbox_shape():
    ret = affine.modify_bbox([100, 50, 300, 150], target_ar=1.0, enlarge=1.1)
    bbox = ret["bbox"]
    w = bbox[2] - bbox[0]
    h = bbox[3] - bbox[1]
    assert abs(h / w - 1.0) < 1e-9
    # enlarged box still centered on the original box
    assert abs((bbox[0] + bbox[2]) / 2 - 200.0) < 1e-9
    assert abs((bbox[1] + bbox[3]) / 2 - 100.0) < 1e-9
    np.testing.assert_allclose(ret["s"] * 200.0, [w, h])


def test_warp_matches_cv2(rng):
    img = rng.uniform(0, 255, size=(375, 500, 3)).astype(np.float32)
    bbox = [120.0, 80.0, 320.0, 220.0]
    ret = affine.modify_bbox(bbox, target_ar=1.0, enlarge=1.1)
    c, s = ret["c"], ret["s"]
    fwd = affine.get_affine_transform(c, s, 0.0, (256, 256))
    inv = affine.get_affine_transform(c, s, 0.0, (256, 256), inv=True)

    ref = cv2.warpAffine(img, fwd, (256, 256), flags=cv2.INTER_LINEAR)
    ours = np.asarray(affine.warp_affine(jnp.asarray(img), jnp.asarray(inv),
                                         (256, 256)))
    # cv2 uses 5-bit fixed-point interpolation weights; tolerance covers it
    assert np.abs(ours - ref).max() < 1.0
    assert np.abs(ours - ref).mean() < 0.1


def test_separable_warp_matches_cv2(rng):
    """The MXU-friendly separable warp == cv2.warpAffine for rot=0 crops."""
    img = rng.uniform(0, 255, size=(375, 500, 3)).astype(np.float32)
    images = np.zeros((2, 384, 512, 3), np.float32)
    images[1, :375, :500] = img
    boxes = [[120.0, 80.0, 320.0, 220.0], [-50.0, -30.0, 200.0, 180.0]]
    invs, refs = [], []
    for bbox in boxes:
        ret = affine.modify_bbox(bbox, target_ar=1.0, enlarge=1.1)
        fwd = affine.get_affine_transform(ret["c"], ret["s"], 0.0, (64, 64))
        invs.append(affine.get_affine_transform(ret["c"], ret["s"], 0.0,
                                                (64, 64), inv=True))
        # oracle warps the padded canvas (border handling must match)
        refs.append(cv2.warpAffine(images[1], fwd, (64, 64),
                                   flags=cv2.INTER_LINEAR))
    out = np.asarray(affine.warp_affine_separable(
        jnp.asarray(images), jnp.asarray(np.stack(invs), ),
        jnp.asarray(np.array([1, 1], np.int32)), (64, 64)))
    for got, ref in zip(out, refs):
        assert np.abs(got - ref).max() < 1.0
        assert np.abs(got - ref).mean() < 0.1


def test_separable_warp_matches_gather_warp(rng):
    img = rng.uniform(0, 255, size=(100, 160, 3)).astype(np.float32)
    ret = affine.modify_bbox([20, 10, 90, 60], target_ar=1.0, enlarge=1.2)
    inv = affine.get_affine_transform(ret["c"], ret["s"], 0.0, (32, 32),
                                      inv=True)
    a = np.asarray(affine.warp_affine(jnp.asarray(img), jnp.asarray(inv),
                                      (32, 32)))
    b = np.asarray(affine.warp_affine_separable(
        jnp.asarray(img[None]), jnp.asarray(inv[None]),
        jnp.zeros(1, np.int32), (32, 32)))[0]
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_warp_border_zero(rng):
    img = np.ones((100, 100, 3), dtype=np.float32)
    # crop that extends far beyond the image: out-of-bounds must be 0
    ret = affine.modify_bbox([-200, -200, 50, 50], target_ar=1.0, enlarge=1.0)
    inv = affine.get_affine_transform(ret["c"], ret["s"], 0.0, (64, 64),
                                      inv=True)
    out = np.asarray(affine.warp_affine(jnp.asarray(img), jnp.asarray(inv),
                                        (64, 64)))
    assert out[0, 0].max() == 0.0
    assert out.max() == 1.0


def test_batched_affine_transform(rng):
    mats = rng.uniform(-1, 1, size=(4, 2, 3))
    pts = rng.uniform(-5, 5, size=(4, 33, 2))
    got = np.asarray(affine.batched_affine_transform(jnp.asarray(pts),
                                                     jnp.asarray(mats)))
    for i in range(4):
        expect = affine.affine_transform_pts(pts[i], mats[i])
        np.testing.assert_allclose(got[i], expect, rtol=1e-5, atol=1e-5)


def test_crop_matrices_closed_form_matches_three_point_solve(rng):
    """The vectorized closed-form crop matrices equal the generic 3-point
    affine construction for rot=0 crops (incl. nonsquare outputs)."""
    from egonet_tpu.ops import affine
    boxes = np.stack([
        np.array([x, y, x + w, y + h])
        for x, y, w, h in zip(rng.uniform(0, 900, 50),
                              rng.uniform(0, 200, 50),
                              rng.uniform(20, 300, 50),
                              rng.uniform(15, 150, 50))])
    for out_hw, target_ar in (((256, 256), 1.0), ((128, 96), 128 / 96)):
        got = affine.crop_matrices_for_boxes(boxes, out_hw, target_ar, 1.2)
        for i, bbox in enumerate(boxes):
            ret = affine.modify_bbox(bbox, target_ar, 1.2)
            c, s = ret["c"], ret["s"]
            fwd = affine.get_affine_transform(c, s, 0.0, out_hw)
            inv = affine.get_affine_transform(c, s, 0.0, out_hw, inv=True)
            np.testing.assert_allclose(got["fwd"][i], fwd, atol=1e-9)
            np.testing.assert_allclose(got["inv"][i], inv, atol=1e-9)
            np.testing.assert_allclose(got["center"][i], c, atol=1e-12)
            np.testing.assert_allclose(got["scale"][i], s, atol=1e-12)
            np.testing.assert_allclose(got["bbox_resize"][i], ret["bbox"],
                                       atol=1e-9)


def test_xy_maps_match_host_generate_xy_map():
    """Device xy coordinate channels (add_xy) equal the host
    generate_xy_map built from the same modified bbox (img_proc.py:193-211
    semantics: inclusive [-1,1] linspace over the crop bbox)."""
    import jax.numpy as jnp
    from egonet_tpu.ops import affine
    rng = np.random.RandomState(11)
    g_w, g_h = 1242, 375
    height = width = 64
    boxes = np.stack([rng.uniform(0, 900, 5), rng.uniform(0, 200, 5),
                      rng.uniform(950, 1200, 5), rng.uniform(220, 370, 5)],
                     axis=1)
    mats = affine.crop_matrices_for_boxes(boxes, (height, width),
                                          height / width, 1.1)
    dev = np.asarray(affine.xy_maps_from_inv_mats(
        jnp.asarray(mats["inv"].astype(np.float32)), (height, width),
        jnp.asarray(np.tile([[g_w, g_h]], (5, 1)).astype(np.float32))))
    for i in range(5):
        host = affine.generate_xy_map(mats["bbox_resize"][i],
                                      (width, height), (g_h, g_w))
        np.testing.assert_allclose(dev[i], host, atol=2e-5)


def test_normalize_crop_patches_five_entry_stats():
    """The shared crop normalizer accepts the reference's 5-entry add_xy
    pth_transform stats (KITTI_train_IGRs.yml:50-51): entries 0:3
    normalize RGB at the 0-255 add_xy scale, entries 3:5 normalize the xy
    coordinate channels after the concat — exactly torchvision Normalize
    over the reference's 5-channel tensor."""
    import jax.numpy as jnp
    from egonet_tpu.ops import affine
    rng = np.random.RandomState(3)
    n, h, w = 4, 8, 8
    patches = rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)
    boxes = np.stack([rng.uniform(0, 60, n), rng.uniform(0, 30, n),
                      rng.uniform(70, 120, n), rng.uniform(40, 90, n)],
                     axis=1)
    mats = affine.crop_matrices_for_boxes(boxes, (h, w), h / w, 1.1)
    inv = jnp.asarray(mats["inv"].astype(np.float32))
    img_wh = jnp.asarray(np.tile([[128.0, 96.0]], (n, 1)), jnp.float32)
    mean = [0.485, 0.456, 0.406, 0.05, -0.02]
    std = [0.229, 0.224, 0.225, 0.9, 1.1]
    cfgs = {"heatmapModel": {"add_xy": True},
            "dataset": {"pth_transform": {"mean": mean, "std": std}}}

    got = np.asarray(affine.normalize_crop_patches(
        cfgs, jnp.asarray(patches), inv, img_wh, (h, w)))

    xy = np.asarray(affine.xy_maps_from_inv_mats(inv, (h, w), img_wh))
    five = np.concatenate([np.round(patches), xy], axis=-1)  # div = 1.0
    want = (five - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)

    # 3-entry stats with add_xy: xy channels pass through unnormalized
    cfgs3 = {"heatmapModel": {"add_xy": True},
             "dataset": {"pth_transform": {"mean": mean[:3],
                                           "std": std[:3]}}}
    got3 = np.asarray(affine.normalize_crop_patches(
        cfgs3, jnp.asarray(patches), inv, img_wh, (h, w)))
    np.testing.assert_allclose(got3[..., 3:], xy, atol=1e-6)
    np.testing.assert_allclose(got3[..., :3], want[..., :3], atol=1e-5)

    # invalid stat shapes fail loudly, not via broadcasting
    import pytest
    with pytest.raises(ValueError, match="5 entries"):
        affine.normalize_crop_patches(
            {"heatmapModel": {},
             "dataset": {"pth_transform": {"mean": mean, "std": std}}},
            jnp.asarray(patches), inv, img_wh, (h, w))
    with pytest.raises(ValueError, match="length mismatch"):
        affine.normalize_crop_patches(
            {"heatmapModel": {"add_xy": True},
             "dataset": {"pth_transform": {"mean": mean, "std": std[:3]}}},
            jnp.asarray(patches), inv, img_wh, (h, w))
