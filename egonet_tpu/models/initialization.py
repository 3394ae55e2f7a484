"""Fast host-side parameter initialization.

``flax.Module.init`` executes one XLA op per parameter (and jitting the
whole init compiles a W48-sized program) — both cost minutes on this host.
Instead we trace shapes with ``jax.eval_shape`` (no compilation) and fill
them with NumPy: LeCun-normal kernels, zero biases, identity batch-norm —
matching flax's default initializers in distribution.  Checkpoint loads
overwrite everything anyway; this only seeds training-from-scratch.
"""

from __future__ import annotations

import numpy as np
import jax


def numpy_init(model, rng_seed: int, *sample_args, method=None) -> dict:
    """Shape-trace ``model.init`` and materialize the variables in NumPy."""
    init_fn = method or model.init
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0), *sample_args)
    rng = np.random.default_rng(rng_seed)

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        name = str(keys[-1])
        shape = tuple(leaf.shape)
        dtype = leaf.dtype
        if "batch_stats" in keys:
            val = np.ones(shape) if name == "var" else np.zeros(shape)
        elif name == "scale":
            val = np.ones(shape)
        elif name == "bias":
            val = np.zeros(shape)
        elif name == "kernel":
            fan_in = int(np.prod(shape[:-1])) if len(shape) > 1 else shape[0]
            std = float(np.sqrt(1.0 / max(fan_in, 1)))
            val = rng.normal(0.0, std, size=shape)
        elif name == "mean":
            val = np.zeros(shape)
        elif name == "var":
            val = np.ones(shape)
        else:
            val = np.zeros(shape)
        leaves.append(np.asarray(val, dtype=dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
