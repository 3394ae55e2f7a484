"""End-to-end slice: synthetic KITTI frames -> fused EgoNet pipeline ->
KITTI txt emission (SURVEY.md §7 step 4, with a small random-weight model)."""

import os

import numpy as np
import pytest

from egonet_tpu.config import default_demo_config
from egonet_tpu.data import kitti
from tests import fixtures


def small_cfg(root):
    cfg = default_demo_config()
    cfg["dataset"]["root"] = root
    return fixtures.shrink_hrnet(cfg)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    root, pred_dir = fixtures.make_kitti_root(tmp, n_images=2,
                                              with_predictions=True)
    cfg = small_cfg(root)
    from egonet_tpu.models.egonet import EgoNet
    model = EgoNet(cfg, pre_trained=False)
    ds = kitti.get_dataset(cfg, split="valid")
    return tmp, root, pred_dir, cfg, model, ds


def test_forward_record_structure(setup):
    _, root, _, cfg, model, ds = setup
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]],
             "raw_txt_format": [rec["raw_txt_format"]]}
    records = model(annot)
    assert path in records
    out = records[path]
    n = len(rec["bbox_2d"])
    assert len(out["kpts_2d_pred"]) == n
    assert out["kpts_3d_pred"].shape == (n, 32, 3)
    assert out["euler_angles"].shape == (n, 3)
    assert out["alphas"].shape == (n,)
    assert np.all(np.isfinite(out["euler_angles"]))
    assert np.all(np.abs(out["alphas"]) <= np.pi + 1e-6)


def test_txt_emission_preserves_detector_fields(setup, tmp_path):
    _, root, pred_dir, cfg, model, ds = setup
    preds = ds.read_predictions(pred_dir)
    name = ds.image_names[0]
    rec = preds[name]
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]],
             "raw_txt_format": [rec["raw_txt_format"]],
             "scores": [[r["score"] for r in rec["raw_txt_format"]]]}
    records = model(annot)
    save_dir = str(tmp_path / "submission")
    model.post_process(records, save_dict={"flag": True,
                                           "save_dir": save_dir})
    out_file = os.path.join(save_dir, name[:-3] + "txt")
    assert os.path.exists(out_file)
    lines = open(out_file).read().splitlines()
    assert len(lines) == len(rec["raw_txt_format"])
    for line, raw in zip(lines, rec["raw_txt_format"]):
        f = line.split()
        assert f[0] == raw["class"]
        # detector fields preserved
        np.testing.assert_allclose([float(x) for x in f[4:8]], raw["bbox"],
                                   atol=1e-5)
        np.testing.assert_allclose(float(f[8]), raw["dimensions"][1],
                                   atol=1e-5)  # h
        np.testing.assert_allclose(float(f[13]), raw["locations"][2],
                                   atol=1e-5)  # z
        assert abs(float(f[15]) - raw["score"]) < 1e-6
        # rot_y / alpha overwritten by the model (untrained -> differs)
        assert float(f[14]) != raw["rot_y"]


def test_pipeline_instance_padding_invariance(setup):
    """Padding instances must not change real-instance outputs."""
    _, root, _, cfg, model, ds = setup
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    # 3 boxes -> bucket 8; run with 1 box -> bucket 8 as well
    annot_full = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]]}
    annot_one = {"path": [path], "boxes": [rec["bbox_2d"][:1]],
                 "K": [rec["K"]]}
    r_full = model(annot_full)[path]
    r_one = model(annot_one)[path]
    np.testing.assert_allclose(r_one["euler_angles"][0],
                               r_full["euler_angles"][0], atol=1e-4)


def test_sharded_inference_matches_single(setup):
    """The mesh-sharded pipeline produces the same outputs as single-device
    (8-way virtual CPU mesh; instances sharded, params replicated)."""
    import jax
    from egonet_tpu.parallel import mesh as pmesh
    from egonet_tpu.models.egonet import EgoNet
    _, root, _, cfg, model, ds = setup
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]]}
    single = model(annot)[path]

    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    model_sharded = EgoNet(cfg, pre_trained=False, mesh=mesh)
    # identical weights
    model_sharded.hrnet_vars = jax.device_put(
        jax.tree_util.tree_map(np.asarray, model.hrnet_vars),
        pmesh.replicated_sharding(mesh))
    model_sharded.lifter_vars = jax.device_put(
        jax.tree_util.tree_map(np.asarray, model.lifter_vars),
        pmesh.replicated_sharding(mesh))
    sharded = model_sharded(annot)[path]
    np.testing.assert_allclose(sharded["euler_angles"],
                               single["euler_angles"], atol=1e-4)
    np.testing.assert_allclose(sharded["alphas"], single["alphas"],
                               atol=1e-4)


def test_multiclass_inference(tmp_path):
    """Car + Pedestrian in one run (BASELINE multi-class config): class
    labels and detector fields preserved per instance."""
    root, _ = fixtures.make_kitti_root(
        tmp_path, n_images=2,
        classes_per_image=[fixtures.CARS + fixtures.PEDS,
                           fixtures.CARS + fixtures.PEDS])
    cfg = small_cfg(root)
    cfg["dataset"]["detect_classes"] = ["Car", "Pedestrian"]
    from egonet_tpu.models.egonet import EgoNet
    model = EgoNet(cfg, pre_trained=False)
    ds = kitti.get_dataset(cfg, split="valid")
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    assert {r["class"] for r in rec["raw_txt_format"]} == {"Car",
                                                           "Pedestrian"}
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]],
             "raw_txt_format": [rec["raw_txt_format"]]}
    records = model(annot)
    save_dir = str(tmp_path / "mc")
    model.post_process(records, save_dict={"flag": True,
                                           "save_dir": save_dir})
    lines = open(os.path.join(save_dir, name[:-3] + "txt")).read().splitlines()
    classes = [line.split()[0] for line in lines]
    assert "Car" in classes and "Pedestrian" in classes
    assert len(lines) == len(rec["raw_txt_format"])


def test_empty_label_file(tmp_path):
    """Images whose label file has no instances of the target class are
    skipped without errors."""
    root, _ = fixtures.make_kitti_root(tmp_path, n_images=2)
    # blank out one label file
    paths = kitti.KITTIPaths(root, "valid")
    name = paths.image_names()[0]
    open(paths.label_path(name), "w").write("")
    cfg = small_cfg(root)
    ds = kitti.get_dataset(cfg, split="valid")
    assert name not in ds.annot_dict  # empty file -> no record


def test_prediction_without_score_column(tmp_path):
    """Detector txts missing the score column parse with score absent."""
    root, pred_dir = fixtures.make_kitti_root(tmp_path, n_images=2,
                                              with_predictions=True)
    # strip the score column from one prediction file
    f = os.path.join(pred_dir, "000001.txt")
    lines = [" ".join(line.split()[:15]) for line in
             open(f).read().splitlines()]
    open(f, "w").write("\n".join(lines) + "\n")
    cfg = small_cfg(root)
    ds = kitti.get_dataset(cfg, split="valid")
    preds = ds.read_predictions(pred_dir)
    assert "000001.png" in preds
    assert "score" not in preds["000001.png"]["raw_txt_format"][0]


def test_stream_annot_dicts_matches_forward(setup):
    """The pipelined streaming API yields the same records as the
    synchronous forward, in order."""
    _, root, _, cfg, model, ds = setup
    annots = []
    for name in ds.image_names:
        rec = ds.annot_dict[name]
        annots.append({"path": [ds.paths.image_path(name)],
                       "boxes": [rec["bbox_2d"]],
                       "K": [rec["K"]],
                       "raw_txt_format": [rec["raw_txt_format"]]})
    streamed = list(model.stream_annot_dicts(iter(annots), depth=2,
                                             enlarge=1.1, alpha_mode="proj"))
    assert len(streamed) == len(annots)
    for annot, records in zip(annots, streamed):
        direct = model(annot, enlarge=1.1, alpha_mode="proj")
        assert set(records) == set(direct)
        for path in direct:
            np.testing.assert_allclose(records[path]["alphas"],
                                       direct[path]["alphas"], atol=1e-6)


def test_stream_annot_dicts_sharded(setup):
    """The streaming API also works with a device mesh (producer-thread
    device_put with NamedSharding) and matches single-device results."""
    from egonet_tpu.models.egonet import EgoNet
    from egonet_tpu.parallel import mesh as pmesh
    _, root, _, cfg, model, ds = setup
    mesh = pmesh.make_mesh()
    sharded = EgoNet(cfg, pre_trained=False, mesh=mesh)
    annots = []
    for name in ds.image_names:
        rec = ds.annot_dict[name]
        annots.append({"path": [ds.paths.image_path(name)],
                       "boxes": [rec["bbox_2d"]],
                       "K": [rec["K"]],
                       "raw_txt_format": [rec["raw_txt_format"]]})
    streamed = list(sharded.stream_annot_dicts(iter(annots), depth=2,
                                               enlarge=1.1,
                                               alpha_mode="proj"))
    for annot, records in zip(annots, streamed):
        direct = model(annot, enlarge=1.1, alpha_mode="proj")
        for path in direct:
            np.testing.assert_allclose(records[path]["alphas"],
                                       direct[path]["alphas"], atol=1e-4)


def test_smoke_3d_box_passthrough(setup, tmp_path):
    """External SMOKE 3D boxes ride through the pipeline (legacy extras,
    inference_legacy.py:621-622): the record gets the absolute p3d layout
    (SMOKE center + 32 relative points) and alpha_mode='trans' recomputes
    the observation angle from the SMOKE 3D location."""
    _, root, _, cfg, model, ds = setup
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    n = len(rec["bbox_2d"])
    rng = np.random.RandomState(7)
    # center-first 9-point SMOKE cuboids in camera coordinates
    smoke = np.concatenate(
        [np.stack([rng.uniform(-10, 10, n), rng.uniform(1, 2, n),
                   rng.uniform(8, 40, n)], axis=1)[:, None, :],
         rng.randn(n, 8, 3)], axis=1)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]],
             "raw_txt_format": [rec["raw_txt_format"]],
             "kpts_3d_SMOKE": [smoke]}
    records = model(annot, alpha_mode="trans")
    out = records[path]
    np.testing.assert_array_equal(out["kpts_3d_SMOKE"], smoke)
    model.post_process(records, alpha_mode="trans",
                       save_dict={"flag": True,
                                  "save_dir": str(tmp_path / "smoke")})
    assert out["kpts_3d_abs"].shape == (n, 33, 3)
    np.testing.assert_array_equal(out["kpts_3d_abs"][:, 0], smoke[:, 0])
    np.testing.assert_array_equal(out["translation"], smoke[:, 0])
    ry = out["euler_angles"][:, 1]
    expect = np.mod(ry - np.arctan2(-smoke[:, 0, 2], smoke[:, 0, 0])
                    - 0.5 * np.pi + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(out["alphas"], expect, atol=1e-9)
    # emitted alpha field (index 3) carries the recomputed value
    line = out["pred_str"].splitlines()[0].split()
    assert np.isclose(float(line[3]), out["alphas"][0], atol=5e-7)
    # 3D overlay renders the magenta SMOKE boxes
    from egonet_tpu.visualization import overlays
    p = overlays.plot_3d_objects(out,
                                 save_path=str(tmp_path / "smoke3d.png"))
    assert os.path.getsize(p) > 1000


def test_add_xy_five_channel_pipeline(setup):
    """add_xy=True runs end-to-end: the fused program concatenates the
    [-1,1] xy coordinate channels (reference egonet.py:91-93) so the
    5-channel HRNet stem actually receives 5 channels — previously only
    the model was widened and inference crashed on shape mismatch."""
    _, root, _, _, _, ds = setup
    cfg = small_cfg(root)
    cfg["heatmapModel"]["add_xy"] = True
    from egonet_tpu.models.egonet import EgoNet
    model = EgoNet(cfg, pre_trained=False)
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]]}
    out = model(annot)[path]
    assert out["kpts_3d_pred"].shape[1:] == (32, 3)
    assert np.all(np.isfinite(out["alphas"]))


def test_r3dt_lifter_trans_alpha(setup):
    """A 99-output 'R3d+T' lifter (reference representation,
    car_instance.py:646-686) makes alpha_mode='trans' consume the REAL
    predicted root: slot 0 of the lifter output is the camera-frame
    translation, slots 1..32 drive the template/Kabsch orientation.  (With
    the shipped 32-point 'R3d' lifter, 'trans' reads a relative corner —
    reference-faithful but meaningless; shipped configs pair it with
    'proj'.)"""
    from egonet_tpu.geometry import rigid
    from egonet_tpu.models.egonet import EgoNet
    _, root, _, _, _, ds = setup
    cfg = small_cfg(root)
    cfg["dataset"]["lft_out_rep"] = "R3d+T"
    cfg["FCModel"] = dict(cfg["FCModel"], output_size=99)
    model = EgoNet(cfg, pre_trained=False)
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]]}
    out = model(annot, alpha_mode="trans")[path]
    n = len(rec["bbox_2d"])
    assert out["kpts_3d_pred"].shape == (n, 33, 3)
    # translation IS the predicted root (not a relative corner)
    np.testing.assert_allclose(out["translation"],
                               out["kpts_3d_pred"][:, 0], rtol=1e-6)
    # orientation comes from the 32 relative points only
    angles, _ = rigid.six_dof_from_cuboids(
        np.asarray(out["kpts_3d_pred"][:, 1:], np.float32))
    np.testing.assert_allclose(out["euler_angles"], np.asarray(angles),
                               atol=1e-4)
    # alpha = wrap(ry - atan2(-z, x) - pi/2) on the real root
    t = out["translation"]
    ry = out["euler_angles"][:, 1]
    expect = np.mod(ry - np.arctan2(-t[:, 2], t[:, 0]) - 0.5 * np.pi
                    + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(out["alphas"], expect, atol=1e-5)
