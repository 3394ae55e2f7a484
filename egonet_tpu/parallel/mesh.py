"""Device mesh and sharding helpers.

Parallelism design (SURVEY.md §2.8): the workload's one real parallel axis is
the instance-crop batch.  We shard that axis over a 1-D ``data`` mesh
(v5e-8: 8 chips over ICI), replicate parameters, and let XLA insert the
gradient ``psum`` — the TPU-native replacement for the reference's
single-process ``torch.nn.DataParallel`` (tools/train_IGRs.py:59).

No TP/PP/SP/EP is built: the models are a ~64M-param CNN plus a 2M-param
MLP with no sequence axis; batch data-parallelism saturates a v5e-8 slice
for 256x256 crops (decision documented in SURVEY.md §2.8).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First-axis (batch/instance) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(tree, mesh: Mesh):
    """Device-put a host pytree with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate_pytree(tree, mesh: Mesh):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_instance_batch(batch: dict, multiple: int,
                       replicated_keys=("images",),
                       mask_keys=("mask", "sup_mask")) -> dict:
    """Pad the leading (instance) axis of every sharded batch array to a
    multiple of the mesh size.

    ``NamedSharding(mesh, P('data'))`` requires the sharded axis to divide
    evenly by the mesh; the default instance cap (MAX_INS_CNT=140) does not
    divide an 8-chip mesh, so un-padded batches would be rejected at
    ``jax.device_put``.  Content rows are padded by WRAPPING real rows
    (train-mode BatchNorm statistics see every slot, and a zeros-padded
    inv_mat would warp a constant dummy crop into them); the ``mask_keys``
    rows pad with zeros so the duplicates stay out of the loss/metrics.
    """
    sizes = {v.shape[0] for k, v in batch.items()
             if k not in replicated_keys and k != "meta"}
    if not sizes:
        return batch
    assert len(sizes) == 1, f"inconsistent instance axes: {sizes}"
    n = sizes.pop()
    target = pad_to_multiple(n, multiple)
    if target == n:
        return batch
    wrap = np.arange(n, target) % n
    out = {}
    for k, v in batch.items():
        if k in replicated_keys or k == "meta":
            out[k] = v
        elif k in mask_keys:
            pad_width = [(0, target - n)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad_width)
        else:
            out[k] = np.concatenate([v, v[wrap]])
    return out
