"""Model summary: parameter counts and FLOPs.

Reference parity: libs/common/utils.py:35-147 computes params + FLOPs with
torch forward hooks; here parameters come from the shape-traced pytree and
FLOPs from XLA's own cost analysis of the compiled forward.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def count_params(variables: dict) -> int:
    params = variables.get("params", variables)
    return int(sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(params)))


def model_summary(model, sample_input, variables=None, train: bool = False,
                  backend: str = "cpu") -> dict:
    """{'params': n, 'flops': n (per forward of sample_input), 'text': str}."""
    if variables is None:
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                                   sample_input)
    n_params = count_params(variables)

    flops = None
    try:
        def fwd(v, x):
            return model.apply(v, x, train=train)
        lowered = jax.jit(fwd).lower(
            jax.tree_util.tree_map(
                lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype)
                if hasattr(s, "shape") else s, variables),
            jax.ShapeDtypeStruct(sample_input.shape, sample_input.dtype))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        flops = int(ca.get("flops", 0)) or None
    except Exception:
        pass

    text = f"Total Parameters: {n_params:,}"
    if flops is not None:
        text += f"\nTotal FLOPs (per batch forward): {flops:,}"
    return {"params": n_params, "flops": flops, "text": text}


def per_layer_summary(model, sample_input, train: bool = False,
                      depth: int | None = None) -> str:
    """Per-module breakdown: path, input/output shapes, FLOPs and parameter
    counts for every named submodule (reference parity: the verbose
    ``get_model_summary`` table, libs/common/utils.py:35-147, which prints
    name/in/out/params/multiply-adds rows via forward hooks; here the rows
    come from a shape trace of the module tree)."""
    import jax.random as jrandom
    kwargs = {"compute_flops": True,
              "console_kwargs": {"width": 180, "force_terminal": False}}
    if depth is not None:
        kwargs["depth"] = depth
    return model.tabulate(jrandom.PRNGKey(0), sample_input, train=train,
                          **kwargs)
