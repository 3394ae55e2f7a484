"""Native checkpointing: msgpack (flax serialization) + torch-compatible
export, plus partial-checkpoint merging for warm starts.

The reference only saves torch state_dicts (HC.pth / L.pth / LS.npy,
tools/train_IGRs.py:103-105, train_lifting.py:46-55); this module adds a
native format while keeping the torch interchange path so reference users
can swap checkpoints in either direction.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from flax import serialization


def save_variables(path: str, variables: dict) -> str:
    host = jax.tree_util.tree_map(np.asarray, variables)
    data = serialization.msgpack_serialize(host)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_variables(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_torch_state_dict(path: str, variables: dict) -> str:
    """Export as a torch .pth loadable by the reference implementation."""
    import torch
    from egonet_tpu.io.torch_convert import flax_to_torch
    # copy=True: jax gives non-writable host views, which torch warns about
    state = {k: torch.from_numpy(np.array(v, copy=True))
             for k, v in flax_to_torch(variables).items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save(state, path)
    return path


def save_lifter_stats(path: str, statistics: dict) -> str:
    """Save LS.npy-compatible normalization statistics."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, {k: np.asarray(v) for k, v in statistics.items()})
    return path


def merge_partial(base: dict, partial: dict) -> dict:
    """Overlay a (possibly partial) checkpoint onto initialized variables.

    Mirrors the reference's layer-filtered pretrained load
    (hrnet.py:634-647): keys present in ``partial`` override ``base``;
    missing keys keep their initialization.
    """
    def merge(b, p):
        if not isinstance(p, dict):
            return p
        out = dict(b) if isinstance(b, dict) else {}
        for k, v in p.items():
            out[k] = merge(out.get(k), v) if isinstance(v, dict) else v
        return out

    return merge(base, partial)
