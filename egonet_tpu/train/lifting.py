"""Stage-1 training: the FC 2D->3D lifting model.

Replaces the reference's ``train_cascade``/``evaluate_cascade``
(/root/reference/libs/trainer/trainer.py:25-111 driven by
tools/train_lifting.py): in-RAM normalized (input, output) pairs, large
batches, MSE loss, Adam + multi-step decay.  Saves the L.pth-equivalent
parameters plus the LS.npy statistics.
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from egonet_tpu.data.loader import ArrayBatchLoader
from egonet_tpu.models.fc_lifter import build_fc_model
from egonet_tpu.parallel import mesh as pmesh
from egonet_tpu.train import losses, optim


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class LiftingTrainer:
    def __init__(self, cfgs: dict, mesh=None, dtype=jnp.float32,
                 steps_per_epoch: int = 1, logger=None):
        self.cfgs = cfgs
        self.mesh = mesh
        self.logger = logger
        self.model = build_fc_model(cfgs, dtype=dtype)
        self.tx, self.schedule = optim.prepare_optim(cfgs, steps_per_epoch)
        self._train_step = None
        self._eval_step = None

    def init_state(self, rng_seed: int = 0) -> TrainState:
        in_size = int(self.cfgs["FCModel"]["input_size"])
        from egonet_tpu.models.initialization import numpy_init
        variables = numpy_init(self.model, rng_seed, jnp.zeros((1, in_size)))
        state = TrainState(variables["params"],
                           variables.get("batch_stats", {}),
                           self.tx.init(variables["params"]),
                           jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = pmesh.replicate_pytree(state, self.mesh)
        else:
            state = jax.device_put(state, jax.devices()[0])
        return state

    def _loss_fn(self, params, batch_stats, batch, dropout_rng):
        out, new_state = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["input"], train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng})
        # loss selection per FCModel.loss_type / loss_reduction (reference
        # train_cascade, trainer.py:50-53; shipped: MSELoss1D, 'mean')
        fc = self.cfgs.get("FCModel", {})
        loss_type = fc.get("loss_type", "MSELoss1D")
        if loss_type == "MSELoss1D":
            loss_fn = losses.mse_loss_1d
        elif loss_type == "SmoothL1Loss1D":
            loss_fn = losses.smooth_l1_loss_1d
        else:
            raise NotImplementedError(loss_type)
        loss = loss_fn(out, batch["output"], batch["mask"])
        if fc.get("loss_reduction", "mean") == "sum":
            # torch reduction='sum': total instead of per-element mean
            loss = loss * jnp.sum(
                jnp.broadcast_to(batch["mask"][:, None], out.shape))
        return loss, new_state["batch_stats"]

    def _make_train_step(self):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, batch, rng):
            dropout_rng = jax.random.fold_in(rng, state.step)
            (loss, new_bs), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, dropout_rng)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            return TrainState(new_params, new_bs, new_opt,
                              state.step + 1), loss
        return step

    def _make_eval_step(self):
        # optional dropout-at-test: loss comparable to the training loss
        # (reference trainer.py:424-428)
        apply_dropout = bool(self.cfgs.get("testing_settings", {})
                             .get("apply_dropout", False))

        @jax.jit
        def step(state: TrainState, batch, rng):
            kwargs = {}
            if apply_dropout:
                kwargs = {"apply_dropout": True, "rngs": {"dropout": rng}}
            out = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["input"], train=False, **kwargs)
            return out
        return step

    def train_step(self, state, batch, rng):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        return self._train_step(state, self._device_batch(batch), rng)

    def eval_step(self, state, batch):
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
            self._eval_calls = 0
        # fresh dropout mask per eval batch (the reference draws a new
        # torch mask every forward; a constant key would condition every
        # evaluation on one arbitrary mask realization)
        rng = jax.random.fold_in(jax.random.PRNGKey(17), self._eval_calls)
        self._eval_calls += 1
        return self._eval_step(state, self._device_batch(batch), rng)

    def _device_batch(self, batch):
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        return pmesh.shard_batch_pytree(batch, self.mesh)

    def fit(self, train_set, valid_set=None, epochs=None, seed: int = 0,
            state=None, ckpt_manager=None, start_epoch: int = 0):
        """train_set: KITTIDataset with exp_type='2dto3d' (normalized).

        ``ckpt_manager``/``start_epoch``/``state``: exact-resume support,
        same contract as IGRTrainer.fit (io/orbax_ckpt.py)."""
        settings = self.cfgs.get("training_settings", {})
        epochs = epochs or int(settings.get("total_epochs", 1))
        batch_size = int(settings.get("batch_size", 2048))
        loader = ArrayBatchLoader(train_set.input, train_set.output,
                                  batch_size, seed=seed)
        if state is None:
            state = self.init_state(seed)
        rng = jax.random.PRNGKey(seed + 1)
        history = []
        for epoch in range(start_epoch, epochs):
            loader.set_epoch(epoch)    # rotate multi-host wrap-padding
            if ckpt_manager is not None or start_epoch:
                loader.reseed((seed + 1) * 1_000_003 + epoch)
            t0 = time.time()
            total, n = 0.0, 0
            for batch in loader.epoch():
                state, loss = self.train_step(state, batch, rng)
                total += float(loss)
                n += 1
            history.append({"epoch": epoch, "loss": total / max(n, 1),
                            "seconds": time.time() - t0})
            if self.logger:
                self.logger.info(f"lifter epoch {epoch}: "
                                 f"loss {history[-1]['loss']:.6f}")
            if valid_set is not None and len(valid_set.input):
                preds = self.predict(state, valid_set.input)
                mse = float(np.mean((preds - valid_set.output) ** 2))
                history[-1]["valid_mse"] = mse
                if self.logger:
                    self.logger.info(f"lifter epoch {epoch}: "
                                     f"valid mse {mse:.6f}")
            if ckpt_manager is not None:
                ckpt_manager.save(epoch + 1, state)
        if ckpt_manager is not None:
            ckpt_manager.wait_until_finished()
        return state, history

    def evaluate(self, state, valid_set, metrics=None,
                 visualize_dir: str | None = None, sample_num: int = 9):
        """Metric-registry evaluation with un-normalized outputs (reference
        evaluate_cascade, trainer.py:73-111 + testing_settings.unnormalize).

        ``visualize_dir`` saves a pred-vs-GT cuboid figure (file-based twin
        of the reference's visualize_lifting_results, trainer.py:323-393).
        """
        from egonet_tpu.train.metrics import Evaluator
        metrics = metrics or self.cfgs.get("training_settings", {}).get(
            "eval_metrics", ["RError3D"])
        num_joints = int(self.cfgs.get("heatmapModel", {})
                         .get("num_joints", 33))
        evaluator = Evaluator(metrics, cfgs=self.cfgs, num_joints=num_joints)
        preds = self.predict(state, valid_set.input)
        gts = valid_set.output
        inputs = valid_set.input
        if self.cfgs.get("testing_settings", {}).get("unnormalize", True) \
                and valid_set.statistics is not None:
            stats = valid_set.statistics
            preds = preds * stats["std_out"] + stats["mean_out"]
            gts = gts * stats["std_out"] + stats["mean_out"]
            inputs = inputs * stats["std_in"] + stats["mean_in"]
        evaluator.update(preds, ground_truth=gts, logger=self.logger)
        if self.logger:
            evaluator.report(self.logger)
        if visualize_dir and len(preds):
            import os
            from egonet_tpu.visualization.overlays import (
                visualize_lifting_results)
            os.makedirs(visualize_dir, exist_ok=True)
            path = visualize_lifting_results(
                inputs, preds, target=gts, sample_num=sample_num,
                save_path=os.path.join(visualize_dir, "lifting_eval.png"))
            if self.logger:
                self.logger.info(f"wrote {path}")
        return evaluator

    def predict(self, state, inputs, batch_size: int = 4096):
        outs = []
        for start in range(0, len(inputs), batch_size):
            chunk = np.asarray(inputs[start:start + batch_size],
                               dtype=np.float32)
            n = len(chunk)
            if n < batch_size:
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n, chunk.shape[1]),
                                     np.float32)])
            out = self.eval_step(state, {"input": chunk})
            outs.append(np.asarray(out)[:n])
        return np.concatenate(outs) if outs else np.zeros((0,))
