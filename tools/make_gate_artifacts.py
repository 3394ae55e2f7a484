"""Regenerate the closed-loop gate's warm-start artifacts.

The default-suite acceptance gate (tests/test_closed_loop_gate.py) fine-tunes
tiny heatmap models from committed warm-start checkpoints instead of training
from scratch: the coordinate-readout trunk of the 'coordinates' head has a
long optimization plateau (~1k steps; see docs/testing.md), which would blow
the gate's wall-clock budget, while a short fine-tune from a donor re-proves
the whole train->checkpoint->infer->eval loop each round at high AOS.

This tool trains those donors on a LARGE synthetic fixture (the slow-test
recipe of tests/test_trained_closed_loop.py) and writes:

    tests/data/gate_hrnet_car.pth    — shrunken W48-family HRNet donor
    tests/data/gate_native_car.pth   — shrunken PoseNetTPU donor

Run it whenever a model-architecture change invalidates the artifacts
(the gate fails loudly on shape mismatch):

    python tools/make_gate_artifacts.py [--epochs 60] [--images 256]

Training runs on whatever JAX platform is available (TPU when present —
the donors are plain weight dicts, platform-neutral).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# the coordinate-readout head needs full-precision matmuls to generalize
# (bf16's ~3 significant digits quantize the sigmoid readout; a bf16-trained
# donor plateaus at ~40 px val error vs <10 px at fp32)
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from egonet_tpu.utils.runtime import enable_compilation_cache
enable_compilation_cache()   # the TPU train-step compile is ~12 min cold

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def donor_classes(backbone: str) -> tuple:
    """Training classes per donor family: the hrnet donor seeds both the
    Car and the Pedestrian gate legs, the native donor only the Car leg."""
    return ("Car", "Pedestrian") if backbone == "hrnet" else ("Car",)


def train_donor(backbone: str, root, epochs: int, seed: int = 0,
                milestones=None):
    import jax
    from egonet_tpu.config import load_config
    from egonet_tpu.data import kitti
    from egonet_tpu.data.loader import IGRBatchLoader
    from egonet_tpu.train.igrs import IGRTrainer
    from tests import fixtures

    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")
    cfg = load_config(os.path.join(here, "KITTI_train_IGRs.yml"))
    cfg["dataset"]["root"] = root
    # the hrnet donor warm-starts BOTH the gate's Car/W48 and Ped/W32 legs,
    # and a Car-only donor does not transfer to pedestrians (measured:
    # zero-shot 46 px on peds vs 7.9 on cars — the readout plateau is
    # layout-specific, and a short fine-tune can't cross it).  The native
    # donor only seeds the Car leg.
    classes = donor_classes(backbone)
    cfg["dataset"]["detect_classes"] = list(classes)
    fixtures.gate_shrink(backbone)(cfg)
    cfg["heatmapModel"]["pretrained"] = ""
    # crop-scale distribution centered between the two product crop chains —
    # the SAME stanza the gate's fine-tune applies (single source of truth,
    # ADVICE r4 #4; scale rationale in fixtures.gate_train_stanza); the
    # donor trains at the config's base LR with real decay milestones
    fixtures.gate_train_stanza(cfg)
    cfg["optimizer"]["milestones"] = list(milestones or [100000])
    ds = kitti.KITTIDataset(cfg, "train")
    print(f"  [{backbone}] {len(ds.records)} train records "
          f"(classes {classes})", flush=True)
    # fixture scenes carry 2 cars + 1 ped; batch_size 6 images must not
    # drop instances at the cap
    loader = IGRBatchLoader(ds.records, cfg, train=True,
                            max_instances=18 if len(classes) > 1 else 12,
                            seed=seed)
    trainer = IGRTrainer(cfg, steps_per_epoch=len(loader))
    state = trainer.init_state(seed)
    t0 = time.time()
    first = last = None
    for ep in range(epochs):
        for batch in loader.epoch():
            state, metrics = trainer.train_step(state, batch,
                                                apply_cr=ep >= 1)
        last = float(metrics["loss"])
        first = first if first is not None else last
        if ep < 2 or ep % 10 == 9:
            print(f"  [{backbone}] epoch {ep}: loss {last:.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    assert last < first * 0.5, (first, last)
    # self-report transfer quality on the donor fixture's own val half
    vs = kitti.KITTIDataset(cfg, "valid")
    ev = trainer.evaluate(state, vs.records[:20])
    print(f"  [{backbone}] val px {ev.metrics[0].mean:.2f} "
          f"(AOS-grade needs < ~12)", flush=True)
    return state


def write_sidecar(backbone: str, donor_path: str):
    """Measure the donor's zero-shot val px error on the gate's EXACT probe
    fixture (fixtures.make_gate_fixture — fresh seed-7 scenes the donor
    never saw) and record it next to the donor as gate_<name>.json.  The
    gate asserts against this at setup (VERDICT r4 #8) so a stale donor
    fails with a legible "regenerate donors" message instead of a
    mysterious AOS miss."""
    import datetime
    import json
    import tempfile

    from tests import fixtures

    root, _ = fixtures.make_gate_fixture(tempfile.mkdtemp())
    px = fixtures.measure_donor_zero_shot(backbone, donor_path, root)
    side = {"val_px": round(px, 3),
            "probe": {"fixture": "tests.fixtures.make_gate_fixture",
                      "seed": fixtures.GATE_SEED,
                      "n_images": fixtures.GATE_N_IMAGES,
                      "metric": "JointDistance2DSIP val px, per class"},
            "date": datetime.date.today().isoformat()}
    if "Pedestrian" in donor_classes(backbone):
        side["val_px_ped"] = round(fixtures.measure_donor_zero_shot(
            backbone, donor_path, root, classes=("Pedestrian",)), 3)
    out = donor_path[:-len(".pth")] + ".json"
    with open(out, "w") as f:
        json.dump(side, f, indent=1)
    print(f"wrote {out}: zero-shot val px {side['val_px']:.2f}"
          + (f" / ped {side['val_px_ped']:.2f}" if "val_px_ped" in side
             else ""), flush=True)
    return px


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--milestones", type=int, nargs="*", default=[90, 130])
    ap.add_argument("--sidecar-only", action="store_true",
                    help="skip training; (re)measure the committed donors' "
                         "zero-shot accuracy and rewrite the sidecars")
    ap.add_argument("--families", nargs="*", default=["hrnet", "tpu_native"],
                    help="subset of donor families to (re)generate — lets an "
                         "interrupted run resume without retraining finished "
                         "donors")
    args = ap.parse_args(argv)

    import tempfile
    import jax
    from egonet_tpu.io import checkpoint
    from tests import fixtures

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    donors = tuple(
        (b, f) for b, f in (("hrnet", "gate_hrnet_car.pth"),
                            ("tpu_native", "gate_native_car.pth"))
        if b in args.families)
    if args.sidecar_only:
        for backbone, fname in donors:
            write_sidecar(backbone, os.path.join(DATA_DIR, fname))
        return
    tmp = tempfile.mkdtemp()
    rng = np.random.RandomState(3)
    scenes = [fixtures.random_scene(rng, n_cars=2, n_peds=1)
              for _ in range(args.images)]
    t0 = time.time()
    root, _ = fixtures.make_kitti_root(tmp, n_images=args.images,
                                       classes_per_image=scenes,
                                       draw_keypoints=True)
    print(f"fixture: {args.images} images in {time.time() - t0:.0f}s",
          flush=True)
    os.makedirs(DATA_DIR, exist_ok=True)
    for backbone, fname in donors:
        state = train_donor(backbone, root, args.epochs,
                            milestones=args.milestones)
        out = os.path.join(DATA_DIR, fname)
        checkpoint.save_torch_state_dict(
            out, {"params": jax.device_get(state.params),
                  "batch_stats": jax.device_get(state.batch_stats)})
        print(f"wrote {out} ({os.path.getsize(out) / 1e6:.2f} MB)",
              flush=True)
        write_sidecar(backbone, out)


if __name__ == "__main__":
    main()
