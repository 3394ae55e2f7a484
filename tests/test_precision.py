"""Precision-drift budget for the shipped bf16 inference path.

The acceptance bar is AOS@R40 within 0.1 of the fp32 reference
(/root/reference/README.md:54, BASELINE.md).  AOS degrades with the cosine
of the alpha error, so sub-degree angle drift is invisible at the 0.1-AOS
level; this test pins the fp32->bf16 drift of ry and alpha through the FULL
fused pipeline (warp -> W48 -> lifter -> SVD -> alpha) under a 0.5-degree
median budget (VERDICT r1 weak #4 / task 4).

CPU caveat: the conftest forces matmul precision 'highest', so bf16 operand
ROUNDING (the dominant error: every activation/weight through ~300 conv/BN
layers) is modeled exactly, while TPU-specific bf16 accumulation differences
are not.  The same harness runs on the real chip via
``python tools/precision_drift.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from egonet_tpu.precision import drift_harness


def test_bf16_angle_drift_budget():
    stats = drift_harness(jnp.float32, jnp.bfloat16, n_instances=6, seed=0)
    # median drift must be far below the AOS-visible scale
    assert stats["median_dry_deg"] < 0.5, stats
    assert stats["median_dalpha_deg"] < 0.5, stats
    # no instance may blow up catastrophically
    assert stats["max_dalpha_deg"] < 5.0, stats


def test_fp32_self_consistency():
    """The harness itself is deterministic: fp32 vs fp32 drift is zero."""
    stats = drift_harness(jnp.float32, jnp.float32, n_instances=4, seed=0)
    assert stats["max_dalpha_deg"] == 0.0
    assert stats["max_dry_deg"] == 0.0
