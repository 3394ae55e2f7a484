"""KITTI data layer tests on the synthetic fixture."""

import numpy as np
import pytest

from egonet_tpu.config import default_demo_config
from egonet_tpu.data import kitti
from egonet_tpu.io import kitti_writer
from tests import fixtures


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("kitti")
    return fixtures.make_kitti_root(tmp, n_images=2, with_predictions=True)


def test_label_parse_roundtrip(kitti_root):
    root, _ = kitti_root
    paths = kitti.KITTIPaths(root, "train")
    names = paths.image_names()
    assert names == ["000000.png"]
    anns = kitti.read_label_file(paths.label_path(names[0]), ("Car",))
    assert len(anns) == 3
    a = anns[0]
    assert a["class"] == "Car"
    # dims stored (l, h, w); fixture writes KITTI order (h, w, l)
    assert a["dimensions"] == [3.69, 1.48, 1.60]
    assert len(a["bbox"]) == 4 and a["bbox"][2] > a["bbox"][0]


def test_calib_parse(kitti_root):
    root, _ = kitti_root
    paths = kitti.KITTIPaths(root, "train")
    P = kitti.read_calib_file(paths.calib_path("000000.png"))
    assert P.shape == (3, 4)
    K, shift = kitti.decompose_projection(P)
    np.testing.assert_allclose(K, fixtures.K_FIXED, rtol=1e-5)
    # shift = K^-1 t
    expect = np.linalg.inv(fixtures.K_FIXED) @ np.array([44.857, 0.216,
                                                         0.0027])
    np.testing.assert_allclose(shift.ravel(), expect, rtol=1e-4)


def test_get_2d_3d_pairs(kitti_root):
    root, _ = kitti_root
    paths = kitti.KITTIPaths(root, "train")
    pairs = kitti.get_2d_3d_pairs(paths.label_path("000000.png"),
                                  paths.calib_path("000000.png"))
    assert len(pairs["kpts_2d"]) == 3
    kp2 = pairs["kpts_2d"][0]
    assert kp2.shape == (33, 3)
    # all fixture cars are fully visible
    assert kp2[:, 2].sum() == 33
    kp3 = pairs["kpts_3d"][0]
    assert kp3.shape == (33, 3)
    # cuboid center depth ~ labeled z + calib z-shift
    assert abs(kp3[0, 2] - 13.4) < 0.5


def test_projected_keypoints_inside_bbox(kitti_root):
    """Projected cuboid keypoints should land close to the labeled 2D box."""
    root, _ = kitti_root
    paths = kitti.KITTIPaths(root, "train")
    pairs = kitti.get_2d_3d_pairs(paths.label_path("000000.png"),
                                  paths.calib_path("000000.png"))
    for kp, bbox in zip(pairs["kpts_2d"], pairs["bboxes"]):
        x1, y1, x2, y2 = bbox.reshape(4)
        margin = 0.6 * max(x2 - x1, y2 - y1)
        assert kp[:, 0].min() > x1 - margin
        assert kp[:, 0].max() < x2 + margin


def test_lifter_representation(kitti_root):
    root, _ = kitti_root
    paths = kitti.KITTIPaths(root, "train")
    pairs = kitti.get_2d_3d_pairs(paths.label_path("000000.png"),
                                  paths.calib_path("000000.png"))
    inp, out, root_pt = kitti.to_lifter_representation(
        pairs["kpts_2d"][0], pairs["kpts_3d"][0], "R3d")
    assert inp.shape == (66,)
    assert out.shape == (96,)
    np.testing.assert_allclose(root_pt, pairs["kpts_3d"][0][[0]])


def test_dataset_inference_mode(kitti_root):
    root, pred_dir = kitti_root
    cfg = default_demo_config()
    cfg["dataset"]["root"] = root
    ds = kitti.get_dataset(cfg, split="valid")
    assert len(ds) == 1
    rec = ds.annot_dict["000001.png"]
    assert rec["bbox_2d"].shape == (3, 4)
    assert rec["kpts_3d"].shape == (3, 33, 3)
    assert len(rec["raw_txt_format"]) == 3
    preds = ds.read_predictions(pred_dir)
    assert "000001.png" in preds
    assert "score" in preds["000001.png"]["raw_txt_format"][0]


def test_dataset_lifting_pairs(kitti_root):
    root, _ = kitti_root
    cfg = default_demo_config()
    cfg["dataset"]["root"] = root
    cfg["exp_type"] = "2dto3d"
    cfg["dataset"]["lft_out_rep"] = "R3d"
    cfg["training_settings"] = {"lft_aug": True, "lft_aug_times": 3}
    train, valid = kitti.prepare_data(cfg)
    # 3 cars x (1 + 3 augmented)
    assert train.input.shape == (12, 66)
    assert train.output.shape == (12, 96)
    # normalized: near zero mean / unit std on train
    assert abs(train.input.mean()) < 1e-5
    stats = train.statistics
    assert stats["mean_in"].shape == (1, 66)
    assert valid.statistics is stats


def test_dataset_instance_records(kitti_root):
    root, _ = kitti_root
    cfg = default_demo_config()
    cfg["dataset"]["root"] = root
    cfg["exp_type"] = "instanceto2d"
    ds = kitti.KITTIDataset(cfg, "train")
    assert len(ds.records) == 1
    rec = ds.records[0]
    assert rec["boxes"].shape[0] == rec["kpts"].shape[0]
    assert rec["kpts"].shape[1:] == (33, 2)
    assert rec["rots"].shape[1] == 2


def test_kitti_writer_byte_format():
    raw = [{
        "class": "Car", "truncation": 0.0, "occlusion": 0.0,
        "alpha": -1.58, "bbox": [587.0, 173.0, 709.0, 259.0],
        "dimensions": [3.69, 1.48, 1.60], "locations": [-2.11, 1.94, 13.4],
        "rot_y": -1.73, "score": 0.9,
    }]
    s = kitti_writer.prediction_str(raw, np.array([[0.1, -1.6934, 0.0]]),
                                    np.array([-1.5512345678]))
    expect = ("Car 0.0 0.0 -1.551235 587.000000 173.000000 709.000000 "
              "259.000000 1.480000 1.600000 3.690000 -2.110000 1.940000 "
              "13.400000 -1.693400 0.90000000 ")
    assert s == expect
    # original dict untouched (deep copy semantics)
    assert raw[0]["rot_y"] == -1.73


def test_inference_boxes_are_keypoint_derived(kitti_root):
    """GT-box inference derives bbox_2d from the projected cuboid keypoints
    (kpts2cs enlarge=1.01), NOT the raw KITTI label box — reference
    gather_annotations default use_raw_bbox=False (car_instance.py:352-354).
    For truncated objects the label box is clipped to the visible part."""
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.ops import affine
    root, _ = kitti_root
    cfg = default_demo_config()
    cfg["dataset"]["root"] = root
    ds = kitti.get_dataset(cfg, split="valid")
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    for i, kp in enumerate(rec["kpts"]):
        c, s, _, _ = affine.kpts2cs(kp[:, :2], enlarge=1.01)
        expected = np.array(affine.cs2bbox(c, s))
        np.testing.assert_allclose(rec["bbox_2d"][i], expected)
    # raw label boxes differ (on the synthetic fixture only by the 1.01
    # enlargement; on real KITTI truncated objects they differ by a lot)
    raw = np.array([r["bbox"] for r in rec["raw_txt_format"]])
    assert np.abs(raw - rec["bbox_2d"]).max() > 0.1


def test_instance_record_cache_keyed_by_enlarge(kitti_root):
    """Changing dataset.enlarge_factor must miss the record cache (the
    cached boxes embed it)."""
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.data.kitti import KITTIDataset
    root, _ = kitti_root
    cfg = default_demo_config()
    cfg["dataset"]["root"] = root
    cfg["exp_type"] = "instanceto2d"
    cfg["dataset"]["enlarge_factor"] = 1.1
    a = KITTIDataset(cfg, "train")._instance_record_cache_path()
    cfg["dataset"]["enlarge_factor"] = 1.4
    b = KITTIDataset(cfg, "train")._instance_record_cache_path()
    assert a != b
