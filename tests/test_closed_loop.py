"""Closed-loop system test (the golden-metric integration test of
SURVEY.md §4): train the lifter on synthetic KITTI pairs, lift GT screen
keypoints, recover rot_y/alpha through the template-fit + Kabsch + euler
pipeline, emit KITTI txts, and score AOS with the evaluator.

This validates, quantitatively and end-to-end: pose augmentation ->
projection -> normalization -> lifter training -> un-normalization ->
rigid orientation solve -> angle wrapping -> byte-level emission ->
evaluation protocol."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from egonet_tpu.config import load_config
from egonet_tpu.data import kitti
from egonet_tpu.geometry import rigid
from egonet_tpu.io import kitti_writer
from egonet_tpu.eval import kitti_eval as ke
from tests import fixtures


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("loop")
    root, _ = fixtures.make_kitti_root(tmp, n_images=2)
    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")
    cfg = load_config(os.path.join(here, "KITTI_train_lifting.yml"))
    cfg["dataset"]["root"] = root
    cfg["training_settings"].update(
        {"total_epochs": 150, "batch_size": 128, "lft_aug_times": 40})
    cfg["FCModel"].update({"input_size": 66, "output_size": 96,
                           "num_neurons": 256, "dropout": 0.0})
    cfg["optimizer"]["milestones"] = [60, 100]
    return tmp, root, cfg


def test_lifter_learns_orientation_end_to_end(setup):
    from egonet_tpu.train.lifting import LiftingTrainer
    tmp, root, cfg = setup
    train_set, valid_set = kitti.prepare_data(cfg)
    steps = max(1, len(train_set.input) // 128)
    trainer = LiftingTrainer(cfg, steps_per_epoch=steps)
    state, history = trainer.fit(train_set)
    assert history[-1]["loss"] < history[0]["loss"] * 0.1

    # lift the (normalized) validation keypoints and recover orientation
    stats = train_set.statistics
    preds_norm = trainer.predict(state, valid_set.input)
    preds = preds_norm * stats["std_out"] + stats["mean_out"]
    cuboids = preds.reshape(len(preds), 32, 3)
    angles, _ = rigid.six_dof_from_cuboids(jnp.asarray(cuboids))
    ry_pred = np.asarray(angles[:, 1])

    # ground-truth yaw for the valid split (same generation path, no aug)
    paths = kitti.KITTIPaths(root, "valid")
    gt_ry = []
    for name in paths.image_names():
        pairs = kitti.get_2d_3d_pairs(paths.label_path(name),
                                      paths.calib_path(name))
        gt_ry.extend(rot[0, 1] for rot in pairs["rotations"])
    gt_ry = np.array(gt_ry)
    assert len(gt_ry) == len(ry_pred)

    err = np.abs(np.arctan2(np.sin(ry_pred - gt_ry),
                            np.cos(ry_pred - gt_ry)))
    mean_err_deg = np.degrees(err.mean())
    assert mean_err_deg < 8.0, f"mean yaw error {mean_err_deg:.2f} deg"

    # emit KITTI txts with the recovered angles and score AOS
    result_dir = str(tmp / "results")
    data_dir = os.path.join(result_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    # alpha via the 'trans' convention from the labeled location
    i = 0
    for name in paths.image_names():
        pairs = kitti.get_2d_3d_pairs(paths.label_path(name),
                                      paths.calib_path(name))
        n = len(pairs["raw"])
        euler = np.zeros((n, 3))
        alphas = np.zeros(n)
        for j, raw in enumerate(pairs["raw"]):
            euler[j, 1] = ry_pred[i]
            x, _, z = raw["locations"]
            a = ry_pred[i] - np.arctan2(-z, x) - 0.5 * np.pi
            alphas[j] = np.arctan2(np.sin(a), np.cos(a))
            raw["score"] = 0.99 - 0.01 * j
            i += 1
        pred_str = kitti_writer.prediction_str(pairs["raw"], euler, alphas)
        with open(os.path.join(data_dir, name[:-3] + "txt"), "w") as f:
            f.write(pred_str)

    results = ke.evaluate(os.path.join(root, "training", "label_2"),
                          result_dir, metrics=("image",), write_stats=False)
    aos = results["car"]["image"]["easy"]["aos_r11"]
    ap = results["car"]["image"]["easy"]["ap_r11"]
    assert ap == pytest.approx(100.0 * 1 / 11, rel=0.5)  # few thresholds
    # orientation similarity close to detection precision => good angles
    assert aos > 0.9 * ap, (aos, ap)
