"""Measure fp32 -> bf16 (and optional int8) angle drift of the fused
pipeline on the current accelerator.  Prints one JSON line.

Usage: python tools/precision_drift.py [n_instances]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax.numpy as jnp
    from egonet_tpu.precision import drift_harness
    from egonet_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    stats = drift_harness(jnp.float32, jnp.bfloat16, n_instances=n)
    print(json.dumps({"pair": "fp32_vs_bf16", **stats}))


if __name__ == "__main__":
    from egonet_tpu.utils.runtime import clean_exit
    main()
    clean_exit(0)
