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


def test_angle_trainer_step(kitti_root):
    from egonet_tpu.train.angle import AngleTrainer, AngleBatchLoader
    cfg = small_train_cfg(kitti_root)
    cfg["exp_type"] = "baselinetheta"
    cfg["heatmapModel"]["head_type"] = "angleregression"
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
