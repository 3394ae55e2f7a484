"""Whole-pipeline differential against the reference PyTorch EgoNet.

The single composed proof (VERDICT r2 missing #1): initialize the TPU
pipeline, export its weights through the torch interchange
(io/checkpoint.save_torch_state_dict -> HC.pth / L.pth / LS.npy), construct
the reference's EgoNet from those checkpoints
(/root/reference/libs/model/egonet.py:29-66) and run its
``forward`` + ``post_process`` (:488-507, :341-408) on the synthetic KITTI
fixture; run ``tools/inference.py`` on the same fixture; then require the
two emitted KITTI txt sets to agree — every non-overwritten field
byte-equal, |d(alpha)|, |d(rot_y)| < 1e-3 — on BOTH the GT-box path and the
predicted-box (double-enlargement) submission path.

This composes every piecewise parity proof (crop chain, warp-vs-cv2, HRNet
conversion, lifter, LS normalize ordering, rigid solver, writer bytes)
through the exact product entry point, covering the composition seams where
piecewise tests can't see a bug (get_keypoints' x input_size + per-instance
inverse affine, egonet.py:437-453; normalize/unnormalize ordering,
:469-486; per-image regrouping, :455-467).

The fixture uses ``smooth`` images: cv2.warpAffine quantizes interpolation
weights to 5 bits (1/32), so crop-level agreement with the exact TPU warp
is only sub-LSB when neighboring pixels are close in value.
"""

import importlib.util
import os

import numpy as np
import pytest
import yaml

from tests import fixtures, refutil

pytestmark = pytest.mark.skipif(not refutil.reference_available(),
                                reason="reference checkout not available")

ALPHA_FIELD, RY_FIELD = 3, 14
ANGLE_TOL = 1e-3


def _load_our_cli():
    here = os.path.dirname(__file__)
    spec = importlib.util.spec_from_file_location(
        "our_tools_inference",
        os.path.join(here, "..", "tools", "inference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize_model(model, rng):
    """Non-trivial BN running stats + lifter normalization statistics so the
    differential exercises eval-mode BN and the LS ordering for real."""
    for tree in (model.hrnet_vars, model.lifter_vars):
        bs = tree.get("batch_stats", {})
        for prefix in bs:
            m = np.asarray(bs[prefix]["mean"])
            v = np.asarray(bs[prefix]["var"])
            bs[prefix]["mean"] = (rng.randn(*m.shape) * 0.1).astype(m.dtype)
            bs[prefix]["var"] = (rng.rand(*v.shape) * 0.5 + 0.75).astype(
                v.dtype)
    # mean_out anchors predictions near a realistic placed cuboid (as a
    # trained LS.npy would): a fully random cuboid makes the Kabsch template
    # fit ill-conditioned and amplifies the inherent +-1-LSB crop noise
    # (cv2's 5-bit fixed-point warp) past the 1e-3 rad gate
    from egonet_tpu.data import cuboid as cb
    box = cb.construct_box_3d(3.9, 1.5, 1.6)[:, 1:]          # [3, 32]
    placed = (cb.rot_y_matrix(0.7) @ box
              + np.array([0.4, 0.6, 14.0]).reshape(3, 1))
    fc = model.cfgs["FCModel"]
    model.ls_stats = {
        "mean_in": rng.uniform(200.0, 500.0,
                               (1, fc["input_size"])).astype(np.float32),
        "std_in": rng.uniform(80.0, 200.0,
                              (1, fc["input_size"])).astype(np.float32),
        "mean_out": placed.T.reshape(1, fc["output_size"]).astype(
            np.float32),
        "std_out": rng.uniform(0.05, 0.15,
                               (1, fc["output_size"])).astype(np.float32),
    }


@pytest.fixture(scope="module", params=[False, True],
                ids=["rgb", "add_xy"])
def world(request, tmp_path_factory):
    """Build fixture + checkpoints, run BOTH implementations, return the
    four emitted txt directories.  Parametrized over add_xy: the 5-channel
    coordinate-map stem (reference egonet.py:91-93 host xy maps +
    hrnet.py:688 modify_input_channel) vs our device-computed xy channels
    is a distinct composition seam worth its own differential."""
    import jax
    import jax.numpy as jnp
    from egonet_tpu.config import default_demo_config
    from egonet_tpu.data import kitti
    from egonet_tpu.io import checkpoint
    from egonet_tpu.models.egonet import EgoNet

    tmp = tmp_path_factory.mktemp("fulldiff")
    # 4 frames -> the valid split holds 2 (fixtures puts names[n//2:] in val)
    root, pred_dir = fixtures.make_kitti_root(tmp, n_images=4,
                                              with_predictions=True,
                                              smooth=True)
    cfg = fixtures.shrink_hrnet(default_demo_config())
    cfg["heatmapModel"]["add_xy"] = bool(request.param)
    if request.param:
        # the add_xy recipe's 5-entry pth_transform stats
        # (KITTI_train_IGRs.yml:50-51 keeps the identity xy extension
        # commented out) — made NON-identity here so the differential
        # proves both sides normalize the coordinate channels, not just
        # the RGB ones (reference: torchvision Normalize over the
        # 5-channel concat; ours: affine.normalize_crop_patches)
        cfg["dataset"]["pth_transform"] = {
            "mean": [0.485, 0.456, 0.406, 0.05, -0.02],
            "std": [0.229, 0.224, 0.225, 0.9, 1.1]}
    cfg["heatmapModel"]["init_weights"] = False
    cfg["dataset"]["root"] = root
    ckpt_dir = str(tmp / "ckpt")
    cfg["dirs"] = {"output": str(tmp / "out_ours"), "ckpt": ckpt_dir,
                   "load_prediction_file": pred_dir}
    cfg["pre_trained"] = True
    cfg["bf16"] = False
    cfg["testing_settings"]["batch_size"] = 2   # both frames in one batch

    # --- export a randomized model through the torch interchange ---------
    rng = np.random.RandomState(11)
    donor = EgoNet(cfg, pre_trained=False, dtype=jnp.float32, rng_seed=5)
    donor.hrnet_vars = jax.tree_util.tree_map(np.asarray,
                                              dict(donor.hrnet_vars))
    donor.lifter_vars = jax.tree_util.tree_map(np.asarray,
                                               dict(donor.lifter_vars))
    _randomize_model(donor, rng)
    checkpoint.save_torch_state_dict(os.path.join(ckpt_dir, "HC.pth"),
                                     donor.hrnet_vars)
    checkpoint.save_torch_state_dict(os.path.join(ckpt_dir, "L.pth"),
                                     donor.lifter_vars)
    checkpoint.save_lifter_stats(os.path.join(ckpt_dir, "LS.npy"),
                                 donor.ls_stats)

    # --- our product path: the actual CLI -------------------------------
    cfg_path = str(tmp / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: v for k, v in cfg.items() if k != "config_path"},
                       f)
    _load_our_cli().main(["--cfg", cfg_path])

    # --- reference path: EgoNet(pre_trained=True) + forward/post_process -
    ref_model = refutil.build_reference_egonet(cfg)
    # guard against a trivially-passing parametrization: the reference must
    # really have built the 5-channel coordinate-map stem when asked to
    stem_in = next(p for n, p in ref_model.HC.named_parameters()
                   if n == "conv1.weight").shape[1]
    assert stem_in == (5 if request.param else 3)
    ds = kitti.get_dataset(cfg, split="valid")
    paths = [ds.paths.image_path(n) for n in ds.image_names]

    ref_out = tmp / "out_ref"
    ref_gt = str(ref_out / "gt_box_test" / "data")
    ref_sub = str(ref_out / "submission" / "data")
    os.makedirs(ref_gt), os.makedirs(ref_sub)

    # GT-box path (ref tools/inference.py:149-165: no alpha_mode ->
    # post_process default 'trans')
    annot = {"path": [], "boxes": [], "K": [], "raw_txt_format": []}
    for name, path in zip(ds.image_names, paths):
        rec = ds.annot_dict[name]
        annot["path"].append(path)
        annot["boxes"].append(np.array(rec["bbox_2d"], np.float64))
        annot["K"].append(np.asarray(rec["K"]))
        annot["raw_txt_format"].append(rec["raw_txt_format"])
    records = ref_model(annot)
    ref_model.post_process(records, save_dict={"flag": True,
                                               "save_dir": ref_gt},
                           color_dict={"bbox_2d": "y", "bbox_3d": "y",
                                       "kpts": ["yx", "y"]})

    # predicted-box path via the reference's own gather_dict (the
    # double-enlargement chain: inference.py:112-117 then egonet.py:81)
    ref_inf = refutil.load_reference_tools_inference()
    width, height = cfg["heatmapModel"]["input_size"]
    annot2 = ref_inf.gather_dict({"path": paths},
                                 ds.read_predictions(pred_dir),
                                 thres=cfg.get("conf_thres", 0.0),
                                 target_ar=height / width,
                                 enlarge=cfg["dataset"].get(
                                     "enlarge_factor", 1.2))
    records2 = ref_model(annot2)
    ref_model.post_process(
        records2, save_dict={"flag": True, "save_dir": ref_sub},
        color_dict={"bbox_2d": "r", "bbox_3d": "r", "kpts": ["rx", "r"]},
        alpha_mode=cfg["testing_settings"]["alpha_mode"])

    our_out = cfg["dirs"]["output"]
    return {
        "gt": (ref_gt, os.path.join(our_out, "gt_box_test", "data")),
        "sub": (ref_sub, os.path.join(our_out, "submission", "data")),
    }


def _angle_dist(a: float, b: float) -> float:
    d = abs(a - b) % (2.0 * np.pi)
    return min(d, 2.0 * np.pi - d)


def _compare_txt_dirs(ref_dir, our_dir):
    ref_files = sorted(f for f in os.listdir(ref_dir) if f.endswith(".txt"))
    our_files = sorted(f for f in os.listdir(our_dir) if f.endswith(".txt"))
    assert ref_files and ref_files == our_files
    n_lines = 0
    max_d = 0.0
    for fname in ref_files:
        ref_lines = open(os.path.join(ref_dir, fname)).read().splitlines()
        our_lines = open(os.path.join(our_dir, fname)).read().splitlines()
        assert len(ref_lines) == len(our_lines), fname
        for li, (rl, ol) in enumerate(zip(ref_lines, our_lines)):
            rt, ot = rl.split(" "), ol.split(" ")
            assert len(rt) == len(ot), (fname, li)
            for fi, (a, b) in enumerate(zip(rt, ot)):
                if fi in (ALPHA_FIELD, RY_FIELD):
                    d = _angle_dist(float(a), float(b))
                    max_d = max(max_d, d)
                    assert d < ANGLE_TOL, (fname, li, fi, a, b)
                else:
                    # non-overwritten detector fields must be byte-equal
                    assert a == b, (fname, li, fi, a, b)
            n_lines += 1
    assert n_lines >= 6   # 3 cars x 2 frames
    return max_d


def test_gt_box_path_matches_reference(world):
    max_d = _compare_txt_dirs(*world["gt"])
    print(f"gt path: max angle delta {max_d:.2e} rad")


def test_submission_path_matches_reference(world):
    max_d = _compare_txt_dirs(*world["sub"])
    print(f"submission path: max angle delta {max_d:.2e} rad")
