"""Closed-loop accuracy datapoint for the SHIPPED full-width TPU-native
family (VERDICT r4 #6).

The default-suite gate and the slow closed loop both train a SHRUNKEN
PoseNetTPU (widths 16/32/64) for wall-clock reasons; this tool runs the
exact same train -> checkpoint -> tools/inference.py -> evaluator loop at
the width users would run (configs/KITTI_tpu_native.yml: depths [1,3,9],
widths [256,512,1024], head 128, stride-8 grid, 256x256 crops) and prints
the official AOS next to the AP, ONE JSON line at the end.

Runs on whatever JAX platform is available — intended for the TPU (a CPU
run of the full-width model takes hours).  Mirrors the recipe of
tests/test_trained_closed_loop.py (reference golden-metric path:
/root/reference/tools/inference.py:269-283); the result is recorded in
docs/testing.md.

    python tools/record_native_fullwidth.py [--epochs 60] [--images 256]
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml

import jax
jax.config.update("jax_default_matmul_precision", "highest")
from egonet_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()

HERE = os.path.dirname(__file__)
CONFIGS = os.path.join(HERE, "..", "egonet_tpu", "configs")


def _load_our_cli():
    spec = importlib.util.spec_from_file_location(
        "our_tools_inference_fw", os.path.join(HERE, "inference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--images", type=int, default=256)
    args = ap.parse_args(argv)

    from egonet_tpu.config import load_config
    from egonet_tpu.data import kitti
    from egonet_tpu.data.loader import IGRBatchLoader
    from egonet_tpu.io import checkpoint
    from egonet_tpu.train.igrs import IGRTrainer
    from egonet_tpu.train.lifting import LiftingTrainer
    from tests import fixtures

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    tmp = tempfile.mkdtemp(prefix="native_fw_")
    rng = np.random.RandomState(3)
    classes = [fixtures.random_cars(rng, 3) for _ in range(args.images)]
    root, pred_dir = fixtures.make_kitti_root(
        tmp, n_images=args.images, with_predictions=True,
        classes_per_image=classes, draw_keypoints=True)

    # ---- heatmap model: the SHIPPED config, verbatim backbone ----------
    cfg = load_config(os.path.join(CONFIGS, "KITTI_tpu_native.yml"))
    cfg["dataset"]["root"] = root
    fixtures.gate_train_stanza(cfg)   # crop chain aligned with submission
    ds = kitti.KITTIDataset(cfg, "train")
    loader = IGRBatchLoader(ds.records, cfg, train=True, max_instances=16,
                            seed=0)
    trainer = IGRTrainer(cfg, steps_per_epoch=len(loader))
    state = trainer.init_state(0)
    t0 = time.time()
    first = last = None
    for ep in range(args.epochs):
        for batch in loader.epoch():
            state, metrics = trainer.train_step(state, batch,
                                                apply_cr=ep >= 1)
        last = float(metrics["loss"])
        first = first if first is not None else last
        if ep < 2 or ep % 10 == 9:
            print(f"epoch {ep}: loss {last:.4f} ({time.time() - t0:.0f}s)",
                  flush=True)
    assert last < first * 0.5, (first, last)
    ck = os.path.join(tmp, "ckpt")
    os.makedirs(ck, exist_ok=True)
    checkpoint.save_torch_state_dict(
        os.path.join(ck, "HC.pth"),
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})

    # ---- lifter ---------------------------------------------------------
    lcfg = load_config(os.path.join(CONFIGS, "KITTI_train_lifting.yml"))
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
    assert lhist[-1]["loss"] < lhist[0]["loss"] * 0.33
    checkpoint.save_torch_state_dict(
        os.path.join(ck, "L.pth"),
        {"params": jax.device_get(lstate.params),
         "batch_stats": jax.device_get(lstate.batch_stats)})
    checkpoint.save_lifter_stats(os.path.join(ck, "LS.npy"),
                                 train_set.statistics)

    # ---- the product path: inference CLI + evaluator --------------------
    icfg = load_config(os.path.join(CONFIGS, "KITTI_inference_demo.yml"))
    icfg["dataset"]["root"] = root
    icfg["heatmapModel"] = dict(cfg["heatmapModel"])
    icfg["heatmapModel"]["init_weights"] = False
    icfg["heatmapModel"]["jitter_bbox"] = False
    icfg["heatmapModel"]["augment_input"] = False
    icfg["FCModel"] = dict(lcfg["FCModel"])
    icfg["dirs"] = {"output": os.path.join(tmp, "out"), "ckpt": ck,
                    "load_prediction_file": pred_dir}
    icfg["pre_trained"] = True
    icfg["bf16"] = False
    icfg["use_gt_box"] = False
    icfg["testing_settings"]["batch_size"] = 4
    cfg_path = os.path.join(tmp, "inf.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({k: v for k, v in icfg.items()
                        if k != "config_path"}, f)
    _load_our_cli().main(["--cfg", cfg_path])

    from egonet_tpu.eval import kitti_eval as ke
    label_dir = os.path.join(root, "training", "label_2")
    res = ke.evaluate(label_dir, os.path.join(tmp, "out", "submission"),
                      write_stats=False)
    easy = res["car"]["image"]["easy"]
    print(json.dumps({
        "family": "tpu_native_fullwidth",
        "config": "KITTI_tpu_native.yml",
        "epochs": args.epochs, "images": args.images,
        "ap_r11_easy": round(easy["ap_r11"], 2),
        "aos_r11_easy": round(easy["aos_r11"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
    from egonet_tpu.utils.runtime import clean_exit
    clean_exit(0)
