"""PyTorch checkpoint <-> Flax pytree conversion.

The reference ships three artifacts (/root/reference/libs/model/egonet.py:58-66):
  * ``HC.pth`` — HRNet keypoint model state_dict,
  * ``L.pth``  — FC lifter state_dict,
  * ``LS.npy`` — lifter input/output normalization statistics.

Because egonet_tpu names its Flax modules with the exact torch key prefixes
(see models/hrnet.py), conversion is a mechanical re-keying plus layout
transposes:

  conv   weight [O, I, kh, kw] -> kernel [kh, kw, I, O]
  linear weight [O, I]         -> kernel [I, O]
  bn     weight/bias           -> scale/bias (params)
  bn     running_mean/var      -> mean/var  (batch_stats)
"""

from __future__ import annotations

import numpy as np


def _to_numpy(v):
    """Zero-copy when possible: CPU torch tensors convert to numpy VIEWS of
    the live torch storage (intended for the load-then-discard checkpoint
    path, where it avoids doubling W48-sized state in memory).  Callers that
    keep the source torch module alive and mutate it afterwards (e.g. a
    torch optimizer step in a differential test) must copy the result."""
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (avoid importing torch unless necessary)
    try:
        return v.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(v)


def load_torch_state_dict(path: str) -> dict:
    """Load a .pth state_dict into {key: np.ndarray} without CUDA."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: _to_numpy(v) for k, v in state.items()}


def torch_to_flax(state_dict: dict) -> dict:
    """Convert a torch state_dict to flax variables {params, batch_stats}."""
    state = {k: _to_numpy(v) for k, v in state_dict.items()}
    bn_prefixes = {k[: -len(".running_mean")] for k in state
                   if k.endswith(".running_mean")}

    params: dict = {}
    batch_stats: dict = {}

    for key, val in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        prefix, _, leaf = key.rpartition(".")
        if prefix in bn_prefixes:
            if leaf == "weight":
                params.setdefault(prefix, {})["scale"] = val
            elif leaf == "bias":
                params.setdefault(prefix, {})["bias"] = val
            elif leaf == "running_mean":
                batch_stats.setdefault(prefix, {})["mean"] = val
            elif leaf == "running_var":
                batch_stats.setdefault(prefix, {})["var"] = val
            else:
                raise ValueError(f"unexpected bn leaf: {key}")
        elif leaf == "weight":
            if val.ndim == 4:
                kernel = np.transpose(val, (2, 3, 1, 0))
            elif val.ndim == 2:
                kernel = np.transpose(val, (1, 0))
            else:
                raise ValueError(f"unexpected weight rank for {key}: {val.shape}")
            params.setdefault(prefix, {})["kernel"] = kernel
        elif leaf == "bias":
            params.setdefault(prefix, {})["bias"] = val
        else:
            raise ValueError(f"unmapped torch key: {key}")

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def flax_to_torch(variables: dict) -> dict:
    """Inverse conversion (used for tests and for exporting checkpoints that
    the reference implementation can load)."""
    state: dict = {}
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    for prefix, leaves in params.items():
        is_bn = prefix in batch_stats
        for leaf, val in leaves.items():
            val = np.asarray(val)
            if leaf == "kernel":
                if val.ndim == 4:
                    state[f"{prefix}.weight"] = np.transpose(val, (3, 2, 0, 1))
                else:
                    state[f"{prefix}.weight"] = np.transpose(val, (1, 0))
            elif leaf == "scale":
                state[f"{prefix}.weight"] = val
            elif leaf == "bias":
                state[f"{prefix}.bias"] = val
            else:
                raise ValueError(f"unmapped flax leaf: {prefix}/{leaf}")
        if is_bn:
            state[f"{prefix}.running_mean"] = np.asarray(batch_stats[prefix]["mean"])
            state[f"{prefix}.running_var"] = np.asarray(batch_stats[prefix]["var"])
            # torch BatchNorm state_dicts carry this counter; the reference
            # loads with strict=True (egonet.py:63-66) so it must exist
            state[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)
    return state


def check_conversion(variables: dict, converted: dict) -> list:
    """Compare tree structure/shapes of a freshly-initialized model against a
    converted checkpoint; returns a list of mismatch strings (empty = ok)."""
    problems = []

    def walk(a, b, path):
        if isinstance(a, dict) != isinstance(b, dict):
            problems.append(f"{path}: structure mismatch")
            return
        if isinstance(a, dict):
            for k in a:
                if k not in b:
                    problems.append(f"{path}/{k}: missing in checkpoint")
                else:
                    walk(a[k], b[k], f"{path}/{k}")
            for k in b:
                if k not in a:
                    problems.append(f"{path}/{k}: unexpected in checkpoint")
        else:
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                problems.append(
                    f"{path}: shape {np.shape(b)} != expected {np.shape(a)}")

    walk(variables, converted, "")
    return problems


def load_lifter_stats(path: str) -> dict:
    """Load LS.npy: {'mean_in','std_in','mean_out','std_out'} float arrays."""
    stats = np.load(path, allow_pickle=True).item()
    return {k: np.asarray(v, dtype=np.float32) for k, v in stats.items()}
