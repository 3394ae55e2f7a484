"""Auxiliary component tests: visualization, angle-regression baseline,
self-supervision hooks, finetune dataset, PnP refinement."""

import os

import numpy as np
import pytest

from egonet_tpu.config import load_config
from egonet_tpu.data import kitti
from tests import fixtures
from tests.test_train import small_train_cfg


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("comp")
    root, _ = fixtures.make_kitti_root(tmp, n_images=2)
    return root


def test_visualization_points(tmp_path):
    from egonet_tpu.visualization import points as vp
    from egonet_tpu.data import cuboid
    fig, ax = vp.new_3d_axis()
    box = cuboid.construct_box_3d(4.0, 1.5, 1.8, interpolate=False)
    vp.plot_3d_points(ax, box)
    vp.plot_3d_bbox(ax, box[:, 1:9].T)
    corners = vp.get_bbox_3d((4.0, 1.5, 1.8), (1.0, 1.5, 20.0), 0.5)
    assert corners.shape == (8, 3)
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_visualization_overlays(tmp_path, rng):
    from egonet_tpu.visualization import overlays
    img = rng.randint(0, 255, (375, 1242, 3)).astype(np.uint8)
    record = {
        "boxes": np.array([[100, 100, 200, 180.0]]),
        "kpts_2d_pred": [rng.uniform(100, 200, 66).reshape(1, 66)],
        "kpts_3d_pred": rng.randn(1, 32, 3),
    }
    path = overlays.plot_2d_objects(img, record,
                                    save_path=str(tmp_path / "o2d.png"))
    assert os.path.exists(path)
    path = overlays.plot_3d_objects(record,
                                    save_path=str(tmp_path / "o3d.png"))
    assert os.path.exists(path)


def test_visualization_debug(tmp_path, rng):
    from egonet_tpu.visualization import debug as vdbg
    crops = rng.rand(3, 64, 64, 3).astype(np.float32)
    joints = rng.uniform(0, 64, (3, 5, 2))
    hms = rng.rand(3, 5, 16, 16).astype(np.float32)
    p1 = vdbg.save_batch_image_with_joints(crops, joints, None,
                                           str(tmp_path / "j.jpg"))
    p2 = vdbg.save_batch_heatmaps(crops, hms, str(tmp_path / "h.jpg"))
    assert os.path.exists(p1) and os.path.exists(p2)
    cfg = {"training_settings": {"debug": {
        "save": True, "save_images_kpts": True,
        "save_hms_gt": True, "save_hms_pred": True}}}
    written = vdbg.save_debug_images(cfg, crops, None, joints, hms, hms,
                                     str(tmp_path / "dbg"))
    assert len(written) == 3


@pytest.mark.parametrize("add_xy", [False, True], ids=["rgb", "add_xy"])
def test_angle_trainer_step(kitti_root, add_xy):
    from egonet_tpu.train.angle import AngleTrainer, AngleBatchLoader
    cfg = small_train_cfg(kitti_root)
    cfg["exp_type"] = "baselinetheta"
    cfg["heatmapModel"]["head_type"] = "angleregression"
    # the reference's baseline configs support add_xy too: init_state must
    # build a 5-channel conv1 for the xy-concatenated crops
    cfg["heatmapModel"]["add_xy"] = add_xy
    ds = kitti.KITTIDataset(cfg, "train")
    trainer = AngleTrainer(cfg)
    loader = AngleBatchLoader(ds.records, cfg, train=True, angle_index=1)
    batch = next(loader.epoch())
    assert batch["angle_target"].shape[1] == 2
    m = batch["meta"]["count"]
    norms = np.linalg.norm(batch["angle_target"][:m], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)
    state = trainer.init_state(0)
    state2, loss = trainer.train_step(state, batch)
    assert np.isfinite(float(loss))
    err = trainer.evaluate(state2, ds.records)
    assert 0.0 <= err <= 180.0


def test_ss_instances_in_loader(kitti_root, tmp_path, rng):
    """Unlabeled ss crops fill padding slots with sup_mask=0."""
    import cv2
    from egonet_tpu.data.loader import IGRBatchLoader
    cfg = small_train_cfg(kitti_root)
    ds = kitti.KITTIDataset(cfg, "train")
    # build a tiny ss record pointing at an unlabeled image
    ss_img = str(tmp_path / "ss.png")
    cv2.imwrite(ss_img, rng.randint(0, 255, (375, 1242, 3)).astype(np.uint8))
    ss_record = {"paths": [ss_img],
                 "boxes": [np.array([[50, 50, 200, 200],
                                     [300, 60, 450, 210.0]])]}
    loader = IGRBatchLoader(ds.records, cfg, train=True,
                            ss_record=ss_record, ss_max_per_img=6)
    batch = next(loader.epoch())
    n_ss = int(batch["mask"].sum() - batch["sup_mask"].sum())
    assert n_ss > 0
    # ss instances index the reserved extra canvas slot
    extra_slot = len(batch["images"]) - 1
    ss_idx = np.where((batch["mask"] == 1) & (batch["sup_mask"] == 0))[0]
    assert all(batch["img_idx"][i] == extra_slot for i in ss_idx)


def test_finetune_dataset(kitti_root):
    cfg = small_train_cfg(kitti_root)
    cfg["exp_type"] = "finetune"
    ds = kitti.KITTIDataset(cfg, "train")
    assert len(ds.records) >= 1
    rec = ds.records[0]
    assert rec["kpts"].shape[1:] == (33, 2)
    assert rec["kpts_3d"].shape[1:] == (33, 3)
    assert rec["boxes"].shape[1] == 4
    assert rec["K"].shape == (3, 3)


def test_pnp_refinement(kitti_root):
    """PnP on perfect projections recovers the camera-frame cuboid."""
    from egonet_tpu.eval import refinement
    from egonet_tpu.data import cuboid as cb
    K = fixtures.K_FIXED
    box = cb.construct_box_3d(3.9, 1.5, 1.7, interpolate=True)
    rot = cb.rot_y_matrix(0.7)
    cam = (rot @ box + np.array([[1.0], [1.5], [15.0]])).T   # [33, 3]
    proj = cb.project_3d_to_2d(cam, K)[:2].T                 # [33, 2]
    # center-relative prediction at the correct shape but wrong pose
    rel = (box[:, 1:] - box[:, :1]).T                        # [32, 3]
    refined = refinement.refine_instance(rel, proj[1:], K)
    np.testing.assert_allclose(refined, cam[1:], atol=0.05)


def test_config_files_load():
    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")
    for name in os.listdir(here):
        cfg = load_config(os.path.join(here, name))
        assert "heatmapModel" in cfg or "FCModel" in cfg, name


def test_pose_resnet_forward():
    import jax, jax.numpy as jnp
    from egonet_tpu.models.resnet import build_pose_resnet
    from egonet_tpu.models.initialization import numpy_init
    from egonet_tpu.io import torch_convert as tc
    cfg = {"heatmapModel": {"num_layers": 18, "num_joints": 33,
                            "extra": {"num_deconv_layers": 2,
                                      "num_deconv_filters": [64, 64],
                                      "num_deconv_kernels": [4, 4],
                                      "final_conv_kernel": 1}}}
    model = build_pose_resnet(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    v = numpy_init(model, 0, x)
    out = model.apply(v, x)
    # stem /4, layers /8 more -> 2x2; 2 deconvs -> 8x8
    assert out.shape == (1, 33, 8, 8)
    sd = tc.flax_to_torch(jax.tree_util.tree_map(np.asarray, dict(v)))
    assert "layer2.0.downsample.0.weight" in sd
    assert "deconv_layers.0.weight" in sd
    assert "final_layer.bias" in sd


def test_normalization_individual(rng):
    from egonet_tpu.data import normalization as nop
    data = rng.randn(5, 66)
    out = nop.normalize_1d(data.copy(), None, None, individual=True)
    pts = out.reshape(5, 33, 2)
    np.testing.assert_allclose(pts[:, :, 0].mean(axis=1), 0, atol=1e-9)
    mean, std = nop.get_statistics_1d(data)
    norm = nop.normalize_1d(data, mean, std)
    back = nop.unnormalize_1d(norm, mean, std)
    np.testing.assert_allclose(back, data, atol=1e-12)


def test_simple_crop_and_xy_map(rng):
    from egonet_tpu.ops import affine
    img = rng.randint(0, 255, (50, 80, 3)).astype(np.uint8)
    out = affine.simple_crop(img, (10, 10), (20, 15))
    assert out.shape == (30, 40, 3)
    # region extending past the top-left is zero-padded
    assert out[0, 0].sum() == 0
    xy = affine.generate_xy_map([0, 0, 80, 50], (16, 16), (50, 80))
    assert xy.shape == (16, 16, 2)
    assert xy[0, 0, 0] == -1.0 and abs(xy[-1, -1, 1] - 1.0) < 1e-9


def test_transform_preds_roundtrip(rng):
    from egonet_tpu.ops import affine
    center, scale = np.array([300.0, 150.0]), np.array([1.2, 1.2])
    fwd = affine.get_affine_transform(center, scale, 0, (64, 64))
    pts_src = rng.uniform(200, 400, (10, 2))
    local = affine.affine_transform_pts(pts_src, fwd)
    back = affine.transform_preds(local, center, scale, (64, 64))
    np.testing.assert_allclose(back, pts_src, atol=1e-9)


def test_step_timer():
    from egonet_tpu.utils.profiling import StepTimer
    t = StepTimer()
    t.tick()
    t.tick()
    t.tick()
    assert t.steps == 2
    assert t.rate(10) > 0


def test_lifter_metric_evaluation(kitti_root):
    from egonet_tpu.train.lifting import LiftingTrainer
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "egonet_tpu", "configs",
                                   "KITTI_train_lifting.yml"))
    cfg["dataset"]["root"] = kitti_root
    cfg["training_settings"].update({"total_epochs": 1, "batch_size": 4,
                                     "lft_aug_times": 2})
    train_set, valid_set = kitti.prepare_data(cfg)
    cfg["FCModel"].update({"input_size": 66, "output_size": 96,
                           "num_neurons": 32})
    trainer = LiftingTrainer(cfg)
    state, _ = trainer.fit(train_set)
    ev = trainer.evaluate(state, valid_set)
    m = ev.metrics[0]
    assert m.rT.count > 0 and np.all(np.isfinite(m.rT.mean))


def test_save_cropped_patches(kitti_root, tmp_path):
    from egonet_tpu.ops import affine
    paths_obj = kitti.KITTIPaths(kitti_root, "train")
    img_path = paths_obj.image_path("000000.png")
    pairs = kitti.get_2d_3d_pairs(paths_obj.label_path("000000.png"),
                                  paths_obj.calib_path("000000.png"))
    kpts = np.stack(pairs["kpts_2d"])
    out_paths, new_kpts, boxes = affine.save_cropped_patches(
        img_path, kpts, str(tmp_path / "crops"))
    assert len(out_paths) == len(kpts)
    assert all(os.path.exists(p) for p in out_paths)
    assert len(boxes) == len(kpts)


def test_instance_record_cache(kitti_root, tmp_path):
    cfg = small_train_cfg(kitti_root)
    cfg["dataset"]["pre-process"] = True
    ds1 = kitti.KITTIDataset(cfg, "train")
    cache = ds1._instance_record_cache_path()
    assert os.path.exists(cache)
    ds2 = kitti.KITTIDataset(cfg, "train")   # loads from cache
    assert len(ds2.records) == len(ds1.records)
    np.testing.assert_array_equal(ds2.records[0]["boxes"],
                                  ds1.records[0]["boxes"])
    os.remove(cache)


def test_ray_triangle_visibility():
    from egonet_tpu.visualization import points as vp
    # a cuboid in front of the camera: the near face is visible, the far
    # face corners are occluded by the near face
    from egonet_tpu.data import cuboid as cb
    box = cb.construct_box_3d(2.0, 2.0, 2.0, interpolate=False)
    corners = (box[:, 1:].T + np.array([0.0, 1.0, 10.0]))   # [8, 3]
    tris = vp.cuboid_triangles(corners)
    vis = vp.get_visibility(corners, tris)
    # at least one corner occluded, at least one visible
    assert vis.any() and not vis.all()
    # single far triangle occludes a point behind it
    tri = np.array([[-1.0, -1.0, 5.0], [1.0, -1.0, 5.0], [0.0, 1.0, 5.0]])
    assert vp.ray_intersect_triangle(np.array([0.0, 0.0, 10.0]),
                                     np.zeros(3), tri) == 1
    assert vp.ray_intersect_triangle(np.array([5.0, 0.0, 10.0]),
                                     np.zeros(3), tri) == 0


def test_get_area():
    from egonet_tpu.visualization import points as vp
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    idx = np.array([[0, 1, 2]])
    area = vp.get_area(pts, idx)
    assert area.shape == (1, 1)
    assert abs(area[0, 0] - 0.5) < 1e-12
    feat = vp.get_area(pts, idx, preserve_points=True)
    assert feat.shape == (1, 7)


def test_pixel_shuffle_matches_torch(rng):
    import torch
    import jax.numpy as jnp
    from egonet_tpu.models.hrnet import _pixel_shuffle
    x = rng.randn(2, 4, 4, 3 * 4).astype(np.float32)  # NHWC, C*r^2 with r=2
    got = np.asarray(_pixel_shuffle(jnp.asarray(x), 2))
    ref = torch.pixel_shuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=0)


def test_hrnet_heatmap_head_with_pixel_shuffle(kitti_root):
    import jax, jax.numpy as jnp
    from egonet_tpu.models.hrnet import build_hrnet
    from egonet_tpu.models.initialization import numpy_init
    cfg = small_train_cfg(kitti_root)
    cfg["heatmapModel"]["head_type"] = "heatmap"
    cfg["heatmapModel"]["pixel_shuffle"] = True
    # upsample factor r = heatmap/input*4 = 16/64*4 = 1 in the small cfg;
    # use 32 to get r=2
    cfg["heatmapModel"]["heatmap_size"] = [32, 32]
    model = build_hrnet(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    v = numpy_init(model, 0, x)
    out = model.apply(v, x)
    assert out.shape == (1, 33, 32, 32)
    assert "upsample_layer.0" in v["params"]


def test_loss_curve_artifact(tmp_path):
    from egonet_tpu.train.igrs import IGRTrainer
    path = IGRTrainer._plot_loss_curve(
        [{"epoch": 0, "loss": 1.0}, {"epoch": 1, "loss": 0.5}],
        str(tmp_path / "loss.png"))
    assert os.path.exists(path)


def test_generate_empty_files(tmp_path):
    """Test-split submissions need an (empty) txt per calib frame
    (ref inference.py:201-213)."""
    from egonet_tpu.io import kitti_writer
    calib = tmp_path / "calib"
    calib.mkdir()
    for i in range(3):
        (calib / f"{i:06d}.txt").write_text("P2: 1 0 0 0\n")
    (calib / "notes.md").write_text("ignored")
    data = tmp_path / "out" / "data"
    data.mkdir(parents=True)
    (data / "000001.txt").write_text("Car 0 0 0 ...\n")
    n = kitti_writer.generate_empty_files(str(tmp_path / "out"), str(calib))
    assert n == 2
    names = sorted(os.listdir(data))
    assert names == ["000000.txt", "000001.txt", "000002.txt"]
    assert (data / "000000.txt").read_text() == ""
    assert (data / "000001.txt").read_text() != ""     # untouched
    # idempotent
    assert kitti_writer.generate_empty_files(str(tmp_path / "out"),
                                             str(calib)) == 0


def test_prefetch_map_propagates_exceptions():
    """A producer-side error re-raises in the consumer instead of silently
    truncating the stream."""
    from egonet_tpu.utils.pipeline import prefetch_map

    def items():
        yield 1
        yield 2
        raise ValueError("boom")

    got = []
    with pytest.raises(ValueError, match="boom"):
        for x in prefetch_map(lambda v: v * 10, items(), depth=2):
            got.append(x)
    assert got == [10, 20]


def test_stream_annot_dicts_raises_on_bad_image(tmp_path):
    """A corrupt image mid-stream fails the run (no silent skip)."""
    from egonet_tpu.models.egonet import EgoNet
    from egonet_tpu.config import default_demo_config
    import copy
    cfg = fixtures.shrink_hrnet(default_demo_config())
    model = EgoNet(cfg, pre_trained=False)
    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"not a png")
    annots = [{"path": [str(bad)], "boxes": [np.array([[5, 5, 40, 40.0]])],
               "K": [np.eye(3)], "raw_txt_format": [[]]}]
    with pytest.raises(ValueError, match="Fail to read"):
        list(model.stream_annot_dicts(iter(annots)))


def test_dataset_show_annot(kitti_root, tmp_path):
    """show_annot saves original + cuboid-annotated figures (reference
    car_instance.show_annot)."""
    cfg = small_train_cfg(kitti_root)
    cfg["exp_type"] = "inference"
    ds = kitti.KITTIDataset(cfg, "valid")
    name = ds.image_names[0]
    orig, annot = ds.show_annot(name, str(tmp_path))
    assert os.path.getsize(orig) > 1000
    assert os.path.getsize(annot) > 1000
    assert annot.endswith("_annotated.png")


def test_visualize_lifting_results(tmp_path, rng):
    """Pred-vs-GT cuboid figure with PnP overlay renders to a file."""
    from egonet_tpu.visualization.overlays import visualize_lifting_results
    from egonet_tpu.data import cuboid as cb
    K = np.array([[707.0, 0, 604.0], [0, 707.0, 180.0], [0, 0, 1.0]])
    preds, gts, data = [], [], []
    for i in range(4):
        box = cb.construct_box_3d(3.9, 1.5, 1.7, interpolate=True)
        cam = (cb.rot_y_matrix(0.4 * i) @ box
               + np.array([[1.0 * i], [1.5], [14.0]])).T       # [33, 3]
        proj = (K @ cam.T)
        uv = (proj[:2] / proj[2]).T                            # [33, 2]
        rel = cam.copy()
        rel[1:] -= rel[:1]
        gts.append(rel.flatten())
        preds.append((rel + 0.03 * rng.randn(*rel.shape)).flatten())
        data.append(uv.flatten())
    path = visualize_lifting_results(
        np.stack(data), np.stack(preds), target=np.stack(gts),
        sample_num=3, intrinsics=K, refine=True,
        save_path=str(tmp_path / "lift.png"))
    assert os.path.getsize(path) > 1000


def test_prefetch_map_abandoned_consumer_stops_producer():
    """Breaking out of a prefetched stream must stop the producer thread —
    a blocking q.put would otherwise park it forever, pinning the last
    prepared batch (code-review r2 finding)."""
    import time
    from egonet_tpu.utils.pipeline import prefetch_map
    produced = []

    def items():
        for i in range(1000):
            produced.append(i)
            yield i

    gen = prefetch_map(None, items(), depth=1)
    assert next(gen) == 0
    gen.close()                       # abandon: finally sets the stop event
    time.sleep(0.4)                   # > the producer's 0.1 s put timeout
    n = len(produced)
    time.sleep(0.3)
    assert len(produced) == n, "producer kept running after abandonment"
    assert n < 1000


def test_pnp_refine_failure_returns_input(monkeypatch):
    """A failed solvePnP must return the input cuboid unchanged — the
    failure branch previously compared against a fresh slice object and
    returned a transposed [3, N] array instead (code-review r2 finding)."""
    import cv2
    from egonet_tpu.eval import refinement
    monkeypatch.setattr(cv2, "solvePnP", lambda *a, **k: (False, None, None))
    kpts_3d = np.random.RandomState(0).randn(32, 3)
    kpts_2d = np.random.RandomState(1).randn(33, 2)
    out = refinement.refine_instance(kpts_3d, kpts_2d[1:], np.eye(3))
    assert out.shape == (32, 3)
    np.testing.assert_array_equal(out, kpts_3d)
    # and refine_record stacks cleanly when every instance fails
    rec = {"kpts_3d_pred": np.stack([kpts_3d, kpts_3d]),
           "kpts_2d_pred": [kpts_2d.reshape(1, -1)] * 2,
           "K": np.eye(3)}
    refinement.refine_record(rec)
    assert rec["kpts_3d_refined"].shape == (2, 32, 3)
