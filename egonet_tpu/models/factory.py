"""Heatmap-model selection by ``heatmapModel.name``.

The reference resolves the backbone with
``eval('models.heatmapModel.' + name + '.get_pose_net')``
(tools/train_IGRs.py:149-152); this is the package's explicit-registry
twin (no ``eval``), extended with the TPU-native family:

  hrnet       -> models/hrnet.py        (reference parity, W48/W32)
  resnet      -> models/resnet.py       (Simple-Baselines parity)
  tpu_native  -> models/tpu_native.py   (MXU-width MBConv family, no
                                         reference counterpart)
"""

from __future__ import annotations

import jax.numpy as jnp

from egonet_tpu.models.hrnet import build_hrnet
from egonet_tpu.models.resnet import build_pose_resnet
from egonet_tpu.models.tpu_native import build_tpu_native

_REGISTRY = {
    "hrnet": build_hrnet,
    "pose_hrnet": build_hrnet,
    "resnet": build_pose_resnet,
    "pose_resnet": build_pose_resnet,
    "tpu_native": build_tpu_native,
    "posenet_tpu": build_tpu_native,
}


def build_heatmap_model(cfgs: dict, dtype=jnp.float32):
    """Build the configured heatmap backbone (default: hrnet)."""
    name = str(cfgs.get("heatmapModel", {}).get("name", "hrnet")).lower()
    try:
        builder = _REGISTRY[name]
    except KeyError:
        raise NotImplementedError(
            f"heatmapModel.name {name!r}; known: {sorted(_REGISTRY)}")
    return builder(cfgs, dtype=dtype)
