"""Helpers for tests that import the reference implementation at
/root/reference as a numeric oracle (never copied).

Importing the reference needs two shims:
  * torchvision is not installed — car_instance.py imports it only for
    runtime transforms, so a stub module satisfies the import;
  * the reference model's forward path calls ``.cuda()`` unconditionally
    (egonet.py:424-486) — tests rebind those methods with the CPU flags.
"""

import os
import sys
import types

REF = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REF)


def ensure_reference_importable() -> None:
    """Put /root/reference on sys.path and stub torchvision (idempotent)."""
    if not reference_available():
        return
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.Normalize = lambda **kw: None
        tvt.ToTensor = lambda: None
        tvt.Compose = lambda x: None
        tvt.RandomHorizontalFlip = lambda p: None
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt


def make_pth_trans(mean, std):
    """A callable equivalent to torchvision Compose([ToTensor(),
    Normalize(mean, std)]) for HWC uint8 numpy images — the transform the
    reference assigns to ``model.pth_trans`` (ref tools/inference.py:147,
    car_instance.py:522-531)."""
    import numpy as np
    import torch
    m = torch.tensor(np.asarray(mean, np.float32)).view(-1, 1, 1)
    s = torch.tensor(np.asarray(std, np.float32)).view(-1, 1, 1)

    def pth_trans(arr):
        t = torch.from_numpy(
            np.ascontiguousarray(np.transpose(arr, (2, 0, 1)))).float()
        if arr.dtype == np.uint8:
            t = t / 255.0
        return (t - m) / s

    return pth_trans


def build_reference_egonet(cfgs):
    """Construct the reference EgoNet on CPU with checkpoints from
    cfgs['dirs']['ckpt'] (HC.pth / L.pth / LS.npy), its forward path
    rebound for CPU execution and pth_trans attached."""
    import functools
    from egonet_tpu.constants import norm_stats

    ensure_reference_importable()
    from libs.model.egonet import EgoNet as RefEgoNet

    model = RefEgoNet(cfgs, pre_trained=True).eval()
    mean, std = norm_stats(cfgs)
    if cfgs["heatmapModel"].get("add_xy") and len(mean) == 3:
        # the reference concatenates the xy maps BEFORE pth_trans
        # (egonet.py:91-95), so an add_xy run needs the 5-entry identity
        # extension its configs keep commented out
        # (KITTI_train_IGRs.yml:50-51: mean +[0,0], std +[1,1])
        import numpy as np
        mean = np.concatenate([mean, [0.0, 0.0]]).astype(np.float32)
        std = np.concatenate([std, [1.0, 1.0]]).astype(np.float32)
    model.pth_trans = make_pth_trans(mean, std)
    model.get_keypoints = functools.partial(RefEgoNet.get_keypoints, model,
                                            is_cuda=False)
    model.lift_2d_to_3d = functools.partial(RefEgoNet.lift_2d_to_3d, model,
                                            cuda=False)
    return model


def load_reference_tools_inference():
    """importlib-load /root/reference/tools/inference.py (it is not a
    package) so tests can drive the reference's own gather_dict /
    filter_conf on the submission path."""
    import importlib.util
    os.environ.setdefault("MPLBACKEND", "Agg")
    ensure_reference_importable()
    spec = importlib.util.spec_from_file_location(
        "ref_tools_inference", os.path.join(REF, "tools", "inference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
