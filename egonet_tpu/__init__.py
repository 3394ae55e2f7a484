"""egonet_tpu — a TPU-native (JAX/XLA/Pallas) framework for monocular vehicle
pose estimation with the capabilities of EgoNet (CVPR 2021).

EgoNet estimates the egocentric orientation of vehicles from a single RGB
image: 2D boxes from an external detector are cropped, an HRNet-style
fully-convolutional network predicts Intermediate Geometric Representations
(33 screen keypoints of an interpolated 3D cuboid), a fully-connected
residual network lifts them to a 3D cuboid, and the rotation (plus the
observation angle alpha) is recovered by rigid alignment against a canonical
cuboid template.

Unlike the reference PyTorch implementation (per-instance NumPy/CV2 loops
around two GPU forward passes), everything between "decoded image" and
"KITTI txt fields" here is a single jitted, vmapped, batch-shardable XLA
program: device-side affine crop, HRNet + lifter in bf16, batched Kabsch
SVD, and vectorized angle extraction.
"""

__version__ = "0.1.0"

import os as _os

# Keep the host CPU backend available next to the TPU platform: parameter
# initialization and tiny host-side ops run there (going through the TPU
# tunnel for ~900 eager init ops costs minutes).  No-op if jax was imported
# before this package.
_p = _os.environ.get("JAX_PLATFORMS")
if _p and _p not in ("", "cpu") and "cpu" not in _p.split(","):
    _os.environ["JAX_PLATFORMS"] = _p + ",cpu"
del _os, _p
