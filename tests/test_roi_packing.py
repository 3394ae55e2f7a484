"""ROI-packed transport (ops/packing.py + the windowed separable warp).

The load-bearing claims: packing only relocates the pixels the warp reads
(plus zero borders); the interpolation WEIGHTS are bit-identical to the
full-canvas path (exact integer-offset construction); warp outputs agree
to 1 fp32 ulp (the only residue is XLA's per-shape accumulation codegen on
the inexact bf16-weight x f32-rowsum products of the second pass).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from egonet_tpu.ops import affine, packing
from tests import fixtures


def _random_mats(rng, n, out_hw, src_hw):
    """Crop affines for random boxes over a src_hw frame (some hanging off
    the edges, some tiny, some huge)."""
    h, w = src_hw
    boxes = []
    for _ in range(n):
        cx = rng.uniform(-50, w + 50)
        cy = rng.uniform(-30, h + 30)
        bw = rng.uniform(8, w * 0.9)
        bh = rng.uniform(8, h * 0.9)
        boxes.append([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2])
    return affine.crop_matrices_for_boxes(
        np.asarray(boxes), out_hw, out_hw[0] / out_hw[1], enlarge=1.1)


def test_footprint_covers_all_nonzero_weights(rng):
    """Every source index with a nonzero fp32 hat weight lies inside the
    planned footprint (the +-1 slack must absorb device fp32 rounding)."""
    out_hw = (64, 64)
    mats = _random_mats(rng, 40, out_hw, (375, 1242))
    inv = mats["inv"]
    x_lo, y_lo, slot_w, slot_h = packing._footprints(inv, out_hw)
    for i in range(len(inv)):
        for axis, lo, size, n_out in ((0, x_lo[i], slot_w[i], out_hw[1]),
                                      (1, y_lo[i], slot_h[i], out_hw[0])):
            start = np.float32(inv[i, axis, 2])
            step = np.float32(inv[i, axis, axis])
            coords = start + step * np.arange(n_out, dtype=np.float32)
            support = np.concatenate([np.floor(coords),
                                      np.floor(coords) + 1])
            assert support.min() >= lo
            assert support.max() <= lo + size - 1


def test_shelf_pack_no_overlap(rng):
    out_hw = (64, 64)
    mats = _random_mats(rng, 60, out_hw, (375, 1242))
    plan = packing.plan(mats["inv"], out_hw,
                        np.tile([1242.0, 375.0], (60, 1)))
    assert plan is not None
    occupancy = np.zeros((plan.canvas_h, plan.canvas_w), np.int32)
    for i in range(len(plan.x0)):
        assert plan.x0[i] + plan.slot_w[i] <= plan.canvas_w
        assert plan.y0[i] + plan.slot_h[i] <= plan.canvas_h
        # the footprint fits its dynamic-slice window
        assert plan.y0[i] >= plan.win_y[i]
        assert plan.y0[i] + plan.slot_h[i] <= plan.win_y[i] + plan.window_h
        occupancy[plan.y0[i]:plan.y0[i] + plan.slot_h[i],
                  plan.x0[i]:plan.x0[i] + plan.slot_w[i]] += 1
    assert occupancy.max() == 1


def test_offset_weights_bit_identical_to_canvas_weights(rng):
    """The packed path's hat weights, mapped back through v = u + offset,
    equal the full-canvas weights bit for bit for every source index the
    canvas path has.  (Indices beyond the canvas can carry nonzero packed
    weights — those read zero-filled slot pixels, the packed realization of
    BORDER_CONSTANT(0), where the canvas path has zero weight instead.)"""
    import jax.numpy as jnp
    out_hw = (64, 64)
    mats = _random_mats(rng, 16, out_hw, (375, 1242))
    inv32 = mats["inv"].astype(np.float32)
    plan = packing.plan(mats["inv"], out_hw,
                        np.tile([1242.0, 375.0], (len(inv32), 1)))
    for i in range(len(inv32)):
        canvas_w = np.asarray(affine._interp_weights(
            jnp.float32(inv32[i, 0, 2]), jnp.float32(inv32[i, 0, 0]),
            out_hw[1], 1280)).astype(np.float32)
        packed_w = np.asarray(affine._interp_weights(
            jnp.float32(inv32[i, 0, 2]), jnp.float32(inv32[i, 0, 0]),
            out_hw[1], plan.canvas_w,
            offset=jnp.float32(plan.offsets[i, 0]))).astype(np.float32)
        off = int(plan.offsets[i, 0])
        checked = 0
        for u in range(plan.canvas_w):
            v = u + off
            if 0 <= v < 1280:
                np.testing.assert_array_equal(packed_w[:, u],
                                              canvas_w[:, v],
                                              err_msg=f"inst {i} col {u}")
                checked += 1
        assert checked > 0


@pytest.mark.parametrize("src_hw", [(375, 1242), (720, 1920)])
def test_packed_warp_matches_canvas_to_one_ulp(rng, src_hw):
    """Windowed packed warp == full-canvas warp to 1 fp32 ulp at pixel
    scale, including boxes hanging off the frame (zero-border reads) — for
    an oversized frame the canvas oracle uses a big enough canvas."""
    out_hw = (64, 64)
    canvas_hw = (max(384, src_hw[0]), max(1280, src_hw[1]))
    img = rng.randint(0, 255, size=(*src_hw, 3)).astype(np.uint8)
    mats = _random_mats(rng, 24, out_hw, src_hw)
    inv32 = mats["inv"].astype(np.float32)

    full = np.zeros((1, *canvas_hw, 3), np.uint8)
    full[0, :src_hw[0], :src_hw[1]] = img
    ref = np.asarray(affine.warp_affine_separable(
        jnp.asarray(full), jnp.asarray(inv32),
        jnp.zeros(len(inv32), jnp.int32), out_hw))

    plan = packing.plan(mats["inv"], out_hw,
                        np.tile([src_hw[1], src_hw[0]],
                                (len(inv32), 1)).astype(np.float64))
    assert plan is not None
    packed = packing.assemble(plan, [img], np.zeros(len(inv32), np.int64))
    got = np.asarray(affine.warp_affine_separable_windowed(
        jnp.asarray(packed), jnp.asarray(inv32), jnp.asarray(plan.offsets),
        jnp.asarray(plan.win_y), out_hw, window_h=plan.window_h,
        bounds=jnp.asarray(plan.bounds)))
    np.testing.assert_allclose(got, ref, atol=3e-5)   # 1 ulp at 255 scale


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("roipack")
    root, _ = fixtures.make_kitti_root(tmp, n_images=2)
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.data import kitti
    cfg = fixtures.shrink_hrnet(default_demo_config())
    cfg["dataset"]["root"] = root
    ds = kitti.get_dataset(cfg, split="valid")
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]]}
    return cfg, annot


def _build(cfg, mode, mesh=None):
    import copy
    from egonet_tpu.models.egonet import EgoNet
    c = copy.deepcopy(cfg)
    c["roi_packing"] = mode
    return EgoNet(c, pre_trained=False, mesh=mesh)


def test_pipeline_packed_matches_canvas(pipe):
    """End to end the two transports agree to float noise.  (Not asserted
    bitwise: a 1-ulp warp difference can in principle flip the uint8
    round() at an exact .5 — never observed on this fixture, but the
    guarantee is 1-ulp crops, not identical bits.)"""
    cfg, annot = pipe
    never = _build(cfg, "never")(dict(annot))
    always = _build(cfg, "always")(dict(annot))
    (path,) = never.keys()
    for key in ("kpts_3d_pred", "euler_angles", "alphas", "translation"):
        np.testing.assert_allclose(always[path][key], never[path][key],
                                   atol=1e-5)
    np.testing.assert_allclose(
        np.concatenate(always[path]["kpts_2d_pred"]),
        np.concatenate(never[path]["kpts_2d_pred"]), atol=1e-4)


def test_pipeline_packed_add_xy(pipe):
    """add_xy coordinate maps are built from the ORIGINAL source-frame
    affines, so packing must not disturb them."""
    import copy
    cfg, annot = pipe
    cfg = copy.deepcopy(cfg)
    cfg["heatmapModel"]["add_xy"] = True
    never = _build(cfg, "never")(dict(annot))
    always = _build(cfg, "always")(dict(annot))
    (path,) = never.keys()
    np.testing.assert_allclose(always[path]["alphas"],
                               never[path]["alphas"], atol=1e-5)


def test_pipeline_packed_sharded_matches_single(pipe):
    import jax
    from egonet_tpu.parallel import mesh as pmesh
    cfg, annot = pipe
    single = _build(cfg, "never")
    mesh = pmesh.make_mesh()
    sharded = _build(cfg, "always", mesh=mesh)
    sharded.hrnet_vars = jax.device_put(
        jax.tree_util.tree_map(np.asarray, single.hrnet_vars),
        pmesh.replicated_sharding(mesh))
    sharded.lifter_vars = jax.device_put(
        jax.tree_util.tree_map(np.asarray, single.lifter_vars),
        pmesh.replicated_sharding(mesh))
    a = single(dict(annot))
    b = sharded(dict(annot))
    (path,) = a.keys()
    np.testing.assert_allclose(b[path]["euler_angles"],
                               a[path]["euler_angles"], atol=1e-5)
    np.testing.assert_allclose(b[path]["alphas"], a[path]["alphas"],
                               atol=1e-5)


def test_oversized_frame_runs_via_packing(tmp_path, rng):
    """Frames larger than the fixed transport canvas work in auto mode —
    packing only ships footprints (canvas mode raises on such frames)."""
    import cv2
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.models.egonet import EgoNet
    root, _ = fixtures.make_kitti_root(tmp_path, n_images=1)
    big = rng.randint(0, 255, size=(800, 2000, 3)).astype(np.uint8)
    big_path = str(tmp_path / "big.png")
    cv2.imwrite(big_path, big)
    cfg = fixtures.shrink_hrnet(default_demo_config())
    cfg["dataset"]["root"] = root
    model = EgoNet(cfg, pre_trained=False)
    annot = {"path": [big_path],
             "boxes": [np.array([[100.0, 120.0, 420.0, 380.0],
                                 [1500.0, 500.0, 1900.0, 760.0]])]}
    out = model(annot)[big_path]
    assert np.all(np.isfinite(out["alphas"]))


def test_serving_profile_geometric_shapes_same_outputs(rng):
    """The 'serving' packing profile pads canvas/window to power-of-two
    row counts (bounded XLA program set for ragged micro-batches) without
    changing placements, weights, or warp outputs."""
    import jax.numpy as jnp
    from egonet_tpu.ops import affine, packing
    n = 12
    imgs = [rng.randint(0, 255, (375, 1242, 3), np.uint8) for _ in range(2)]
    boxes = np.stack([
        [x, y, x + w, y + h]
        for x, y, w, h in zip(rng.uniform(0, 900, n), rng.uniform(0, 200, n),
                              rng.uniform(60, 320, n),
                              rng.uniform(40, 170, n))])
    mats = affine.crop_matrices_for_boxes(boxes, (256, 256), 1.0, 1.1)
    idx = rng.randint(0, 2, n)
    wh = np.tile([[1242.0, 375.0]], (n, 1))
    plans = {p: packing.plan(mats["inv"], (256, 256), wh, profile=p)
             for p in ("transport", "serving")}
    sp = plans["serving"]
    # the serving discipline: geometric heights from the 512 base, widths
    # from the coarse (2048, 4096) set — a handful of possible shapes
    assert sp.window_h in (512, 1024, 2048, 4096)
    assert sp.canvas_h in (512, 1024, 2048, 4096)
    assert sp.canvas_w in (2048, 4096)
    # slots (footprints) are profile-invariant; PLACEMENT repacks per
    # canvas width, so only the warp outputs — each slot is
    # self-contained — are required to agree below
    np.testing.assert_array_equal(sp.slot_w, plans["transport"].slot_w)
    np.testing.assert_array_equal(sp.slot_h, plans["transport"].slot_h)

    outs = {}
    for p, pl in plans.items():
        canvas = packing.assemble(pl, imgs, idx)
        outs[p] = np.asarray(affine.warp_affine_separable_windowed(
            jnp.asarray(canvas), jnp.asarray(mats["inv"], np.float32),
            jnp.asarray(pl.offsets), jnp.asarray(pl.win_y), (256, 256),
            window_h=pl.window_h, bounds=jnp.asarray(pl.bounds)))
    np.testing.assert_allclose(outs["serving"], outs["transport"],
                               atol=1e-4)

    with pytest.raises(ValueError):
        packing.plan(mats["inv"], (256, 256), wh, profile="bogus")
