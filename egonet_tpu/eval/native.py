"""Locating/rebuilding the native C++ KITTI evaluator.

The binary is a build artifact (not committed); every caller that shells out
to it must go through :func:`ensure_evaluator`, which rebuilds via ``make``
whenever ``kitti_eval.cpp`` is newer than the binary — a stale local binary
silently diverging from the source is impossible by construction (the
reference likewise builds from source, docs/preparation.md:31-39).
"""

import os
import subprocess

EVAL_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "tools",
                 "kitti-eval"))
BINARY = os.path.join(EVAL_DIR, "evaluate_object_3d_offline")


def ensure_evaluator(quiet: bool = True):
    """Return the path to an up-to-date evaluator binary, or ``None``.

    Runs ``make -C tools/kitti-eval`` (a no-op when the binary is already
    newer than the source, thanks to make's mtime rule).  Returns ``None``
    when the build fails or the toolchain is unavailable — callers then fall
    back to the parity-tested Python evaluator (egonet_tpu/eval/kitti_eval).
    """
    try:
        subprocess.check_call(
            ["make", "-C", EVAL_DIR],
            stdout=subprocess.DEVNULL if quiet else None,
            stderr=subprocess.DEVNULL if quiet else None)
    except (OSError, subprocess.CalledProcessError):
        return BINARY if os.path.exists(BINARY) else None
    return BINARY if os.path.exists(BINARY) else None
