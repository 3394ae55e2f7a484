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


def warm_start_variables(cfgs: dict, model, logger=None):
    """Layer-filtered warm start from a pretrained torch ``.pth`` (the
    reference's start-point mechanism: hrnet.py:634-647 filters the loaded
    state_dict by ``extra.pretrained_layers`` before ``load_state_dict``).

    Returns a full variables dict (fresh init overlaid with the filtered
    pretrained weights), or ``None`` when ``heatmapModel.pretrained`` is
    unset/absent or ``init_weights`` is false.  Shared by tools/train_igrs.py
    and the closed-loop acceptance gate.
    """
    import jax.numpy as jnp
    from egonet_tpu.io import torch_convert

    hm = cfgs["heatmapModel"]
    pretrained = hm.get("pretrained")
    if not (hm.get("init_weights") and pretrained):
        return None
    if not os.path.exists(pretrained):
        # the reference fails loudly here (hrnet.py:645-647); a typo'd path
        # must not silently fall back to random init
        raise ValueError(
            f"heatmapModel.pretrained is set but does not exist: "
            f"{pretrained!r}")
    if logger is not None:
        logger.info(f"loading pretrained start point {pretrained}")
    sd = torch_convert.load_torch_state_dict(pretrained)
    allowed = hm["extra"].get("pretrained_layers", ["*"])
    if allowed and allowed[0] != "*":
        sd = {k: v for k, v in sd.items() if k.split(".")[0] in allowed}
    partial = torch_convert.torch_to_flax(sd)
    in_ch = 5 if hm.get("add_xy") else 3
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, hm["input_size"][1], hm["input_size"][0], in_ch)))
    return merge_partial(dict(init), partial)


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
