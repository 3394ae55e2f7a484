"""Exact-resume checkpointing via Orbax CheckpointManager.

The msgpack/torch pair saved by ``IGRTrainer.save_snapshot`` carries only
``params`` + ``batch_stats`` — enough to warm-start or to export, but NOT
enough to resume training exactly: the Adam moments, the MultiStep schedule
position and the step counter are lost, so a resumed run re-enters the
high-LR region with zeroed momentum.  (The reference has the same gap: its
epoch snapshots are bare ``state_dict`` saves, trainer.py:256-261, and its
``resume`` config key is a dead placeholder, configs/KITTI_train_IGRs.yml:156.)

``TrainCheckpointManager`` closes it with the idiomatic JAX stack: the FULL
``TrainState`` pytree (params, batch_stats, opt_state, step) is written
asynchronously by :mod:`orbax.checkpoint` with retention (``max_to_keep``),
atomic finalization, and restore-into-template semantics so dtypes/shardings
follow the live state.  Saves overlap the next epoch's compute; ``close()``
drains any in-flight write.
"""

from __future__ import annotations

import os
from typing import Any

import jax


class TrainCheckpointManager:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager`` for full
    train-state save/restore keyed by epoch (or any integer step)."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save))

    # -- write ----------------------------------------------------------
    def save(self, step: int, state: Any, wait: bool = False) -> None:
        """Queue a full-state save at ``step``; async unless ``wait``."""
        self._mgr.save(int(step),
                       args=self._ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    # -- read -----------------------------------------------------------
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None) -> Any:
        """Restore into the structure/dtypes/shardings of ``template``
        (e.g. a fresh ``trainer.init_state(seed)``)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint steps under {self.directory}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(
                x, "sharding", None)) if hasattr(x, "shape") else x,
            template)
        return self._mgr.restore(
            int(step), args=self._ocp.args.StandardRestore(abstract))

    # -- lifecycle ------------------------------------------------------
    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
