"""Trained end-to-end closed loop through the official metric
(VERDICT r2 #3): train the HEATMAP model AND the lifter on a synthetic
KITTI set whose pixels carry the geometry (distinct-colored keypoint dots),
export HC.pth / L.pth / LS.npy, run the REAL inference CLI
(tools/inference.py) with the trained checkpoints on the validation split,
and demand a high orientation score (AOS) from the evaluator.

This is the strongest end-to-end ACCURACY statement available without the
released checkpoints / real KITTI: every stage of the product path — data
layer, both trainers, the torch checkpoint interchange, the fused
crop->HC->lifter->Kabsch->alpha pipeline, KITTI emission, the evaluation
protocol — must cooperate for the final number to be high.  It mirrors the
reference's de-facto golden-metric test (SURVEY §4.1; reference
tools/inference.py:269-283).

Parametrized over the heatmap backbone: the reference-parity HRNet AND
the TPU-native PoseNetTPU family (models/tpu_native.py) both have to
clear the same AOS bar — run one with ``-k hrnet`` / ``-k tpu_native``.
"""

import importlib.util
import os

import numpy as np
import pytest
import yaml

from tests import fixtures

# ~1 h of CPU training: run on demand (EGONET_SLOW_TESTS=1), not in the
# default suite.  COVERAGE.md records the output of a full run.
pytestmark = pytest.mark.skipif(
    not os.environ.get("EGONET_SLOW_TESTS"),
    reason="trained closed loop trains for ~1 h; set EGONET_SLOW_TESTS=1")

N_IMAGES = 256          # 128 train / 128 valid
CARS_PER_IMAGE = 3
HC_EPOCHS = 60
AOS_EASY_MIN = 85.0


def _load_our_cli():
    here = os.path.dirname(__file__)
    spec = importlib.util.spec_from_file_location(
        "our_tools_inference_tcl",
        os.path.join(here, "..", "tools", "inference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _shrink_backbone(cfg, backbone):
    """Apply the tiny-model config for the parametrized backbone family."""
    if backbone == "hrnet":
        return fixtures.shrink_hrnet(cfg)
    # head_width must comfortably exceed the reference head trunk's 35
    # channels (maps+xy): an 8-wide coordinate trunk is an information
    # bottleneck that caps AOS ~50 on this fixture
    return fixtures.shrink_tpu_native(cfg, depths=(1, 1, 2),
                                      widths=(16, 32, 64), head_width=48,
                                      grid_stride=8)


@pytest.fixture(scope="module", params=["hrnet", "tpu_native"])
def trained_world(request, tmp_path_factory):
    import jax
    from egonet_tpu.config import load_config
    from egonet_tpu.data import kitti
    from egonet_tpu.data.loader import IGRBatchLoader
    from egonet_tpu.io import checkpoint
    from egonet_tpu.train.igrs import IGRTrainer
    from egonet_tpu.train.lifting import LiftingTrainer

    tmp = tmp_path_factory.mktemp("trainedloop")
    rng = np.random.RandomState(3)
    classes = [fixtures.random_cars(rng, CARS_PER_IMAGE)
               for _ in range(N_IMAGES)]
    root, pred_dir = fixtures.make_kitti_root(
        tmp, n_images=N_IMAGES, with_predictions=True,
        classes_per_image=classes, draw_keypoints=True)
    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")

    # --- stage 2: train the heatmap model on the drawn keypoints ---------
    cfg = load_config(os.path.join(here, "KITTI_train_IGRs.yml"))
    cfg["dataset"]["root"] = root
    _shrink_backbone(cfg, request.param)
    cfg["heatmapModel"]["pretrained"] = ""
    # training crops aligned with the submission crop chain (1.2 x 1.1 ==
    # one 1.32x enlargement; the aspect fix commutes with scaling), with
    # mild jitter for generalization and a constant lr (the tiny set
    # converges before any decay is useful)
    cfg["dataset"]["enlarge_factor"] = 1.32
    cfg["heatmapModel"]["jitter_params"] = {"scaling": [0.2, 0.2],
                                            "shift": [0.05, 0.05]}
    cfg["optimizer"]["milestones"] = [100000]
    cfg["training_settings"].update({"batch_size": 6, "total_epochs": 1})
    ds = kitti.KITTIDataset(cfg, "train")
    loader = IGRBatchLoader(ds.records, cfg, train=True, max_instances=16,
                            seed=0)
    trainer = IGRTrainer(cfg, steps_per_epoch=len(loader))
    state = trainer.init_state(0)
    first = last = None
    for ep in range(HC_EPOCHS):
        for batch in loader.epoch():
            state, metrics = trainer.train_step(state, batch,
                                                apply_cr=ep >= 1)
        first = first if first is not None else float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first * 0.5, (first, last)

    ck = str(tmp / "ckpt")
    checkpoint.save_torch_state_dict(
        os.path.join(ck, "HC.pth"),
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})

    # --- stage 1: train the lifter on GT 2D->3D pairs --------------------
    lcfg = load_config(os.path.join(here, "KITTI_train_lifting.yml"))
    lcfg["dataset"]["root"] = root
    lcfg["training_settings"].update({"total_epochs": 150,
                                      "batch_size": 128,
                                      "lft_aug_times": 40})
    lcfg["FCModel"].update({"input_size": 66, "output_size": 96,
                            "num_neurons": 256, "dropout": 0.0})
    lcfg["optimizer"]["milestones"] = [60, 100]
    train_set, _valid = kitti.prepare_data(lcfg)
    lt = LiftingTrainer(lcfg,
                        steps_per_epoch=max(1, len(train_set.input) // 128))
    lstate, lhist = lt.fit(train_set)
    # sanity only — the REAL bar is the evaluator's AOS below (measured
    # convergence on this fixture: 0.266 -> 0.047, a 5.6x drop)
    assert lhist[-1]["loss"] < lhist[0]["loss"] * 0.33
    checkpoint.save_torch_state_dict(
        os.path.join(ck, "L.pth"),
        {"params": jax.device_get(lstate.params),
         "batch_stats": jax.device_get(lstate.batch_stats)})
    checkpoint.save_lifter_stats(os.path.join(ck, "LS.npy"),
                                 train_set.statistics)

    # --- the product path: inference CLI with the trained checkpoints ----
    icfg = load_config(os.path.join(here, "KITTI_inference_demo.yml"))
    icfg["dataset"]["root"] = root
    _shrink_backbone(icfg, request.param)
    icfg["heatmapModel"]["init_weights"] = False
    icfg["FCModel"] = dict(lcfg["FCModel"])
    icfg["dirs"] = {"output": str(tmp / "out"), "ckpt": ck,
                    "load_prediction_file": pred_dir}
    icfg["pre_trained"] = True
    icfg["bf16"] = False
    icfg["use_gt_box"] = False
    icfg["testing_settings"]["batch_size"] = 4
    cfg_path = str(tmp / "inf.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: v for k, v in icfg.items()
                        if k != "config_path"}, f)
    _load_our_cli().main(["--cfg", cfg_path])
    return root, str(tmp / "out" / "submission")


def test_trained_pipeline_scores_high_aos(trained_world):
    """The official evaluator (C++ binary when built, else the
    cross-checked Python twin) scores the trained pipeline's orientation
    above a strong bar on the easy split."""
    root, submission = trained_world
    label_dir = os.path.join(root, "training", "label_2")
    from egonet_tpu.eval import kitti_eval as ke
    res = ke.evaluate(label_dir, submission, write_stats=False)
    easy = res["car"]["image"]["easy"]
    ap, aos = easy["ap_r11"], easy["aos_r11"]
    print(f"trained closed loop: AP_R11 easy {ap:.2f}, AOS_R11 {aos:.2f}")
    assert ap > 99.0, f"GT-box detections must give ~100 AP, got {ap}"
    assert aos >= AOS_EASY_MIN, f"AOS_R11 easy {aos:.2f} < {AOS_EASY_MIN}"


def test_trained_pipeline_cpp_evaluator_agrees(trained_world):
    """When the C++ evaluator binary is built, its AOS agrees with the
    Python twin on the trained submission."""
    root, submission = trained_world
    binary = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "kitti-eval", "evaluate_object_3d_offline")
    if not os.path.exists(binary):
        pytest.skip("C++ evaluator not built")
    import subprocess
    label_dir = os.path.join(root, "training", "label_2")
    out = subprocess.check_output([binary, label_dir, submission]).decode()
    line = [ln for ln in out.splitlines()
            if ln.startswith("car_orientation AP_R11")][0]
    cpp_aos = float(line.split(":")[1].split()[0])
    from egonet_tpu.eval import kitti_eval as ke
    res = ke.evaluate(label_dir, submission, metrics=("image",),
                      write_stats=False)
    assert cpp_aos == pytest.approx(res["car"]["image"]["easy"]["aos_r11"],
                                    abs=1e-4)
