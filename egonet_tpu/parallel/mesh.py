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
                       replicated_keys=("images",)) -> dict:
    """Zero-pad the leading (instance) axis of every sharded batch array to a
    multiple of the mesh size.

    ``NamedSharding(mesh, P('data'))`` requires the sharded axis to divide
    evenly by the mesh; the default instance cap (MAX_INS_CNT=140) does not
    divide an 8-chip mesh, so un-padded batches would be rejected at
    ``jax.device_put``.  Padding rows carry mask=0 and are excluded from the
    loss/metrics; a zero inv_mat warps to an all-black crop.
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
    out = {}
    for k, v in batch.items():
        if k in replicated_keys or k == "meta":
            out[k] = v
        else:
            pad_width = [(0, target - n)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad_width)
    return out
