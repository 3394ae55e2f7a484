"""Export the fused inference program as serialized StableHLO artifacts.

AOT deployment path (egonet_tpu/io/export.py): lowers the canvas-mode
fused program for the standard instance-bucket shape set and writes
weight-agnostic, cross-platform artifacts + manifest.json.

Usage:
  python tools/export_model.py --cfg egonet_tpu/configs/KITTI_inference_demo.yml \
      --out /path/to/artifacts [--buckets 8,16,32,64,128] \
      [--platforms tpu,cpu] [--alpha-mode proj]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="AOT-export the fused EgoNet program")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--buckets", default="8,16,32,64,128")
    parser.add_argument("--platforms", default="tpu,cpu")
    parser.add_argument("--alpha-mode", default="proj",
                        choices=("proj", "trans"))
    parser.add_argument("--n-img", type=int, default=16)
    args = parser.parse_args(argv)

    from egonet_tpu import config as cfg_mod
    from egonet_tpu.io import export as export_mod
    from egonet_tpu.models.egonet import EgoNet
    from egonet_tpu.utils.runtime import config_dtype

    cfgs = cfg_mod.load_config(args.cfg)
    model = EgoNet(cfgs, pre_trained=cfgs.get("pre_trained", False),
                   dtype=config_dtype(cfgs))
    manifest = export_mod.export_shape_set(
        model, args.out,
        buckets=tuple(int(b) for b in args.buckets.split(",")),
        n_img=args.n_img,
        platforms=tuple(args.platforms.split(",")),
        alpha_mode=args.alpha_mode)
    total = sum(e["bytes"] for e in manifest["artifacts"].values())
    print(f"exported {len(manifest['artifacts'])} programs "
          f"({total / 1e6:.1f} MB) -> {args.out}")


if __name__ == "__main__":
    main()
    from egonet_tpu.utils.runtime import clean_exit
    clean_exit(0)
