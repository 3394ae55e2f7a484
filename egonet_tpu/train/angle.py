"""Baseline angle-regression training (exp types 'baselinealpha' /
'baselinetheta').

The reference trains the HRNet 'angleregression' head to predict
[cos(a), sin(a)] of either the observation angle alpha or the global yaw
theta directly from the crop (car_instance.py:1248-1271 prepares the
targets; the head is hrnet.py:384-422).  Same fused-batch design as the IGR
trainer: device-side crop, forward, MSE on the unit-circle embedding.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from egonet_tpu.data.loader import IGRBatchLoader
from egonet_tpu.models.factory import build_heatmap_model
from egonet_tpu.ops import affine
from egonet_tpu.parallel import mesh as pmesh
from egonet_tpu.train import losses, optim
from egonet_tpu.train.metrics import get_angle_error


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class AngleBatchLoader(IGRBatchLoader):
    """IGR loader + per-instance angle targets.

    exp_type 'baselinealpha' regresses alpha (rots[:, 0]);
    'baselinetheta' regresses the global yaw ry (rots[:, 1]).
    """

    def __init__(self, records, cfgs, train, angle_index: int, **kw):
        super().__init__(records, cfgs, train, **kw)
        self.angle_index = angle_index

    def _assemble(self, chunk):
        batch = super()._assemble(chunk)
        m = batch["meta"]["count"]
        # meta['instance_ids'] carries (chunk index, box index) per kept
        # instance IN BATCH ORDER, so targets stay aligned with the crops
        # even after the parent's random cap subsampling reordered them
        ids = batch["meta"]["instance_ids"]
        angles = np.asarray(
            [chunk[i]["rots"][j, self.angle_index] for i, j in ids],
            np.float64)
        cap = len(batch["mask"])
        target = np.zeros((cap, 2), np.float32)
        target[:m, 0] = np.cos(angles)
        target[:m, 1] = np.sin(angles)
        batch["angle_target"] = target
        batch["meta"]["angles_gt"] = angles
        return batch


class AngleTrainer:
    def __init__(self, cfgs: dict, mesh=None, dtype=jnp.float32,
                 steps_per_epoch: int = 1, logger=None):
        assert cfgs["heatmapModel"]["head_type"] == "angleregression"
        self.cfgs = cfgs
        self.mesh = mesh
        self.logger = logger
        self.model = build_heatmap_model(cfgs, dtype=dtype)
        self.input_size = tuple(cfgs["heatmapModel"]["input_size"])
        self.tx, self.schedule = optim.prepare_optim(cfgs, steps_per_epoch)
        self._train_step = None
        self._eval_step = None
        self.angle_index = 0 if cfgs["exp_type"] == "baselinealpha" else 1

    def init_state(self, rng_seed: int = 0) -> TrainState:
        from egonet_tpu.models.initialization import numpy_init
        w, h = self.input_size
        # conv1's input-channel dim is inferred from this sample: add_xy
        # models take 5-channel crops (RGB + xy coordinate maps)
        in_ch = 5 if self.cfgs["heatmapModel"].get("add_xy") else 3
        variables = numpy_init(self.model, rng_seed,
                               jnp.zeros((1, h, w, in_ch)))
        state = TrainState(variables["params"],
                           variables.get("batch_stats", {}),
                           self.tx.init(variables["params"]),
                           jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = pmesh.replicate_pytree(state, self.mesh)
        else:
            state = jax.device_put(state, jax.devices()[0])
        return state

    def _crops(self, batch):
        w, h = self.input_size
        patches = affine.warp_affine_separable(
            batch["images"], batch["inv_mats"], batch["img_idx"], (h, w))
        return affine.normalize_crop_patches(
            self.cfgs, patches, batch["inv_mats"], batch.get("img_wh"),
            (h, w))

    def _loss_fn(self, params, batch_stats, batch):
        crops = self._crops(batch)
        out, new_state = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, crops,
            train=True, mutable=["batch_stats"])
        loss = losses.mse_loss_1d(out, batch["angle_target"], batch["mask"])
        return loss, new_state["batch_stats"]

    def _make_train_step(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch):
            (loss, new_bs), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(state.params, state.batch_stats,
                                             batch)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                                state.params, updates)
            return TrainState(new_params, new_bs, new_opt,
                              state.step + 1), loss
        return step

    def train_step(self, state, batch):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if k != "meta"}
        return self._train_step(state, device_batch)

    def eval_step(self, state, batch):
        if self._eval_step is None:
            @jax.jit
            def step(state, batch):
                return self.model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    self._crops(batch), train=False)
            self._eval_step = step
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if k != "meta"}
        return self._eval_step(state, device_batch)

    def evaluate(self, state, records):
        loader = AngleBatchLoader(records, self.cfgs, train=False,
                                  angle_index=self.angle_index)
        total_err, total_cnt = 0.0, 0
        for batch in loader.epoch(shuffle=False):
            m = batch["meta"]["count"]
            pred = np.asarray(self.eval_step(state, batch))[:m]
            err, cnt = get_angle_error(pred, batch["meta"]["angles_gt"])
            total_err += err * cnt
            total_cnt += cnt
        mean_err = total_err / max(total_cnt, 1)
        if self.logger:
            self.logger.info(f"angle error: {mean_err:.3f} deg "
                             f"({total_cnt} instances)")
        return mean_err
