"""Experiment configuration: YAML loading + CLI parsing.

Accepts the reference's ``configs/*.yml`` schema unchanged
(/root/reference/libs/arguments/parse.py:22-47 reads a raw YAML dict; this
module does the same but adds light validation and defaulting so downstream
code can rely on required keys).
"""

from __future__ import annotations

import argparse
import copy
import os

import yaml

_DEFAULTS = {
    "visualize": False,
    "batch_to_show": 1_000_000,
    "use_gpu": False,          # meaningless on TPU; kept for YAML compat
}


def read_yaml_file(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def load_config(path: str, overrides: dict | None = None) -> dict:
    cfgs = read_yaml_file(path)
    cfgs["config_path"] = path
    for key, val in _DEFAULTS.items():
        cfgs.setdefault(key, val)
    if overrides:
        cfgs = merge_config(cfgs, overrides)
    return cfgs


def merge_config(base: dict, overrides: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in overrides.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = v
    return out


def str2bool(value) -> bool:
    """Proper boolean CLI parsing.  The reference uses ``type=bool`` which
    makes ``--visualize False`` truthy (any non-empty string is True); this
    accepts the usual spellings and rejects everything else."""
    if isinstance(value, bool):
        return value
    v = str(value).strip().lower()
    if v in ("1", "true", "t", "yes", "y", "on"):
        return True
    if v in ("0", "false", "f", "no", "n", "off", ""):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {value!r}")


def parse_args(argv=None) -> dict:
    """CLI-compatible with the reference tools: --cfg / --visualize /
    --batch_to_show."""
    parser = argparse.ArgumentParser(description="egonet_tpu entry point")
    parser.add_argument("--cfg", type=str, required=True,
                        help="experiment configuration file path")
    parser.add_argument("--visualize", default=False, type=str2bool,
                        nargs="?", const=True)
    parser.add_argument("--batch_to_show", default=1_000_000, type=int)
    args, _unknown = parser.parse_known_args(argv)
    cfgs = load_config(args.cfg)
    cfgs["visualize"] = args.visualize
    cfgs["batch_to_show"] = args.batch_to_show
    return cfgs


def default_demo_config() -> dict:
    """The shipped inference configuration (KITTI_inference:demo.yml)
    as a Python dict, usable without any YAML on disk."""
    here = os.path.dirname(__file__)
    return load_config(os.path.join(here, "configs", "KITTI_inference_demo.yml"))
