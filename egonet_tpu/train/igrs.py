"""Stage-2 training: the HRNet keypoint (IGR) model.

Replaces the reference's torch training loop
(/root/reference/libs/trainer/trainer.py:127-263 driven by
tools/train_IGRs.py) with a single pjit-able train step: device-side crop
warping, Gaussian-target rendering, forward, composite loss, gradient
all-reduce over the data mesh and optax update — one XLA program.

Parallelism: batches are instance-sharded over the 1-D ``data`` mesh;
parameters/optimizer state are replicated; XLA inserts the gradient psum.
The cross-ratio term switches on after the first epoch
(trainer.py:167-169).
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from egonet_tpu.data.loader import IGRBatchLoader
from egonet_tpu.models.factory import build_heatmap_model
from egonet_tpu.ops import affine
from egonet_tpu.ops.keypoints import gaussian_targets
from egonet_tpu.parallel import mesh as pmesh
from egonet_tpu.train import losses, optim


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class IGRTrainer:
    def __init__(self, cfgs: dict, mesh=None, dtype=jnp.float32,
                 steps_per_epoch: int = 1, logger=None):
        self.cfgs = cfgs
        self.mesh = mesh
        self.dtype = dtype
        self.logger = logger
        self.model = build_heatmap_model(cfgs, dtype=dtype)
        self.loss_cfg = losses.CompositeLossConfig(cfgs)
        hm = cfgs["heatmapModel"]
        self.input_size = tuple(hm["input_size"])           # (w, h)
        self.heatmap_size = tuple(hm.get("heatmap_size", (64, 64)))
        self.sigma = float(hm.get("sigma", 1.0))
        self.tx, self.schedule = optim.prepare_optim(cfgs, steps_per_epoch)
        self._train_step = None
        self._eval_step = None
        self._crop_fn = None

    # ------------------------------------------------------------------

    def init_state(self, rng_seed: int = 0, variables=None) -> TrainState:
        w, h = self.input_size
        in_ch = 5 if self.cfgs["heatmapModel"].get("add_xy") else 3
        if variables is None:
            from egonet_tpu.models.initialization import numpy_init
            variables = numpy_init(self.model, rng_seed,
                                   jnp.zeros((1, h, w, in_ch)))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        freeze = self.cfgs["heatmapModel"]["extra"].get("freeze_layers", [])
        if freeze:
            self.tx = optim.apply_freezing(self.tx, params, freeze)
        opt_state = self.tx.init(params)
        state = TrainState(params, batch_stats, opt_state,
                           jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            state = pmesh.replicate_pytree(state, self.mesh)
        else:
            state = jax.device_put(state, jax.devices()[0])
        return state

    # ------------------------------------------------------------------

    def _crops_from_batch(self, batch):
        """Device-side warp + normalize of all instances in the batch
        (+ the xy coordinate channels for add_xy 5-channel models)."""
        w, h = self.input_size
        patches = affine.warp_affine_separable(
            batch["images"], batch["inv_mats"], batch["img_idx"], (h, w))
        return affine.normalize_crop_patches(
            self.cfgs, patches, batch["inv_mats"], batch.get("img_wh"),
            (h, w))

    def _loss_fn(self, params, batch_stats, batch, apply_cr):
        crops = self._crops_from_batch(batch)
        outputs, new_state = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            crops, train=True, mutable=["batch_stats"])
        joints = batch["joints"]                            # [M, K, 3]
        w, h = self.input_size
        targets, tweight = gaussian_targets(
            joints[..., :2], joints[..., 2],
            (self.heatmap_size[1], self.heatmap_size[0]),
            (h, w), self.sigma)
        use_tw = bool(self.cfgs.get("training_settings", {})
                      .get("use_target_weight", False))
        total, comps = losses.composite_loss(
            outputs, targets, joints[..., :2], self.loss_cfg,
            mask=batch["mask"], apply_cr=apply_cr,
            target_weight=tweight if use_tw else None,
            sup_mask=batch.get("sup_mask"))
        return total, (new_state["batch_stats"], comps)

    def _make_train_step(self):
        @functools.partial(jax.jit, static_argnames=("apply_cr",),
                           donate_argnums=(0,))
        def step(state: TrainState, batch, apply_cr: bool):
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (loss, (new_bs, comps)), grads = grad_fn(
                state.params, state.batch_stats, batch, apply_cr)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            metrics = {"loss": loss, **comps}
            return TrainState(new_params, new_bs, new_opt,
                              state.step + 1), metrics
        return step

    def _make_eval_step(self):
        @jax.jit
        def step(state: TrainState, batch):
            crops = self._crops_from_batch(batch)
            maps, coords = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                crops, train=False)
            return {"maps": maps, "coords": coords}
        return step

    # ------------------------------------------------------------------

    def train_step(self, state, batch, apply_cr: bool = False):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        batch = self._device_batch(batch)
        return self._train_step(state, batch, apply_cr)

    def eval_step(self, state, batch):
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        batch = self._device_batch(batch)
        return self._eval_step(state, batch)

    def _device_batch(self, batch):
        batch = {k: v for k, v in batch.items() if k != "meta"}
        if isinstance(batch.get("mask"), jax.Array):
            return batch                    # already transferred (prefetch)
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        # the sharded instance axis must divide the mesh (MAX_INS_CNT=140
        # does not divide 8); pad before device_put
        batch = pmesh.pad_instance_batch(batch, self.mesh.devices.size)
        out = {}
        for k, v in batch.items():
            if k == "images":
                # images are indexed by every instance: replicate
                out[k] = jax.device_put(
                    v, pmesh.replicated_sharding(self.mesh))
            else:
                out[k] = jax.device_put(v, pmesh.batch_sharding(self.mesh))
        return out

    # ------------------------------------------------------------------

    def evaluate(self, state, records, metrics=None):
        """Run validation metrics over a record set (reference
        trainer.evaluate, trainer.py:395-514)."""
        from egonet_tpu.train.metrics import Evaluator
        metrics = metrics or self.cfgs.get("testing_settings", {}).get(
            "eval_metrics", ["JointDistance2DSIP"])
        evaluator = Evaluator(metrics, cfgs=self.cfgs,
                              num_joints=self.cfgs["heatmapModel"]
                              ["num_joints"])
        # reuse one validation loader across evaluations: mid-epoch evals
        # (eval_every) would otherwise re-decode the whole validation image
        # set from disk every time (the loader's LRU decode cache amortizes
        # it, like the reference's single persistent valid_dataset)
        # shard_hosts=False: every host scores the FULL validation set.
        # A sharded eval would double-count wrap-padded duplicates and
        # leave per-host Evaluator results unaggregated (ADVICE r3).
        cached = getattr(self, "_eval_loader", None)
        if cached is None or cached[0] is not records:
            cached = (records,
                      IGRBatchLoader(records, self.cfgs, train=False,
                                     shard_hosts=False))
            self._eval_loader = cached
        loader = cached[1]
        for batch in loader.epoch(shuffle=False):
            meta = batch["meta"]
            out = self.eval_step(state, batch)
            m = meta["count"]
            coords = np.asarray(out["coords"])[:m]
            evaluator.update((np.asarray(out["maps"])[:m], coords),
                             meta_data=meta, logger=self.logger)
        if self.logger:
            evaluator.report(self.logger)
        return evaluator

    def save_snapshot(self, state, path_prefix: str):
        """Save a native + torch-compatible checkpoint pair."""
        from egonet_tpu.io import checkpoint
        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        checkpoint.save_variables(path_prefix + ".msgpack", variables)
        checkpoint.save_torch_state_dict(path_prefix + ".pth", variables)

    def debug_dump(self, state, batch, prefix: str):
        """Write keypoint/heatmap debug grids for one batch (reference
        save_debug_images, visualization/debug.py:151-189)."""
        from egonet_tpu.visualization import debug as vdbg
        from egonet_tpu.ops.keypoints import gaussian_targets
        if self._crop_fn is None:
            self._crop_fn = jax.jit(self._crops_from_batch)
        device_batch = self._device_batch(batch)
        crops = np.asarray(self._crop_fn(device_batch))
        out = self.eval_step(state, batch)
        m = batch["meta"]["count"]
        w, h = self.input_size
        coords = np.asarray(out["coords"])[:m] * np.array([w, h])
        joints = batch["joints"][:m]
        targets, _ = gaussian_targets(
            jnp.asarray(joints[..., :2]), jnp.asarray(joints[..., 2]),
            (self.heatmap_size[1], self.heatmap_size[0]), (h, w), self.sigma)
        return vdbg.save_debug_images(
            self.cfgs, crops[:m], joints, coords, np.asarray(targets),
            np.asarray(out["maps"])[:m], prefix)

    def fit(self, train_records, valid_records=None, epochs=None,
            seed: int = 0, report_every: int | None = None, eval_hook=None,
            snapshot_dir: str | None = None, state=None,
            ss_record=None, ss_img_root: str = "", ss_max_per_img: int = 6,
            ckpt_manager=None, start_epoch: int = 0, loader_kwargs=None):
        """Full training loop mirroring the reference epoch structure
        (trainer.py:127-263): per-epoch loader, cross-ratio after epoch 1,
        periodic logging, optional mid-training evaluation and epoch
        snapshots.

        ``ckpt_manager`` (io.orbax_ckpt.TrainCheckpointManager) saves the
        FULL train state after every epoch, asynchronously; pass it together
        with ``state`` restored from it and ``start_epoch`` = latest saved
        step to resume exactly.  When exact-resume is in play the per-epoch
        shuffle order is derived from (seed, epoch) rather than a sequential
        RNG so the resumed run sees the same batches the uninterrupted run
        would have."""
        settings = self.cfgs.get("training_settings", {})
        epochs = epochs or int(settings.get("total_epochs", 1))
        report_every = report_every or int(settings.get("report_every", 30))
        eval_during = bool(settings.get("eval_during", False))
        # mid-epoch evaluation cadence (reference trainer.py:242-254:
        # evaluate every eval_every batches when eval_during is set, only
        # after eval_start_epoch)
        eval_every = int(settings.get("eval_every", 0) or 0)
        eval_start_epoch = int(settings.get("eval_start_epoch", 0) or 0)
        snapshot_epochs = set(settings.get("snapshot_epochs", []))
        debug_cfg = settings.get("debug", {}) or {}
        dump_debug = bool(debug_cfg.get("save")) and snapshot_dir
        loader = IGRBatchLoader(train_records, self.cfgs, train=True,
                                seed=seed, ss_record=ss_record,
                                ss_img_root=ss_img_root,
                                ss_max_per_img=ss_max_per_img,
                                **(loader_kwargs or {}))
        if state is None:
            state = self.init_state(seed)
        history = []
        for epoch in range(start_epoch, epochs):
            # rotate multi-host wrap-padding (no-op single-process)
            loader.set_epoch(epoch)
            if ckpt_manager is not None or start_epoch:
                # shuffle as a pure function of (seed, epoch): resumable
                loader.reseed((seed + 1) * 1_000_003 + epoch)
            # cross-ratio loss switches on after the first epoch
            apply_cr = epoch >= 1 and self.loss_cfg.use_cr
            t0 = time.time()
            n_batches = 0
            running = 0.0
            # fetch each step's loss one step LATE: blocking on step i's
            # scalar before dispatching i+1 serializes a device round-trip
            # per step; a depth-1 window keeps the device busy
            pending_loss = None

            def _prep(b):
                # transfer on the producer thread, but keep the host-side
                # meta alongside for the periodic debug dumps
                meta = b.get("meta")
                db = dict(self._device_batch(b))
                db["meta"] = meta
                return db

            for batch in loader.prefetched_epoch(device_fn=_prep):
                state, metrics = self.train_step(state, batch, apply_cr)
                n_batches += 1
                if pending_loss is not None:
                    running += float(pending_loss)
                pending_loss = metrics["loss"]
                if self.logger and n_batches > 1 \
                        and n_batches % report_every == 0:
                    self.logger.info(
                        f"epoch {epoch} batch {n_batches} "
                        f"loss {running / (n_batches - 1):.5f}")
                # 0-based batch index: the reference dumps/evaluates on
                # batch_idx % period == 0, INCLUDING each epoch's batch 0
                # for the debug dumps (trainer.py:211-234)
                batch_idx = n_batches - 1
                if dump_debug and batch_idx % report_every == 0:
                    self.debug_dump(
                        state, batch,
                        f"{snapshot_dir}/debug/e{epoch}_b{batch_idx}")
                # reference eval gating (trainer.py:242-243, 1-BASED
                # epochs: `epoch > eval_start_epoch` with default 0 fires
                # from the first epoch -> 0-based equivalent is >=),
                # never on a period's batch 0
                if (eval_during and valid_records and eval_every
                        and epoch >= eval_start_epoch and batch_idx
                        and batch_idx % eval_every == 0):
                    self.evaluate(state, valid_records)
            if pending_loss is not None:
                running += float(pending_loss)
            dt = time.time() - t0
            history.append({"epoch": epoch,
                            "loss": running / max(n_batches, 1),
                            "seconds": dt})
            if self.logger:
                self.logger.info(
                    f"epoch {epoch} done: loss "
                    f"{history[-1]['loss']:.5f} ({dt:.1f}s)")
            if eval_during and valid_records:
                self.evaluate(state, valid_records)
            if snapshot_dir and (epoch + 1) in snapshot_epochs:
                self.save_snapshot(state,
                                   f"{snapshot_dir}/HC_epoch{epoch + 1}")
            if ckpt_manager is not None:
                # full-state save (params + batch_stats + opt_state + step);
                # async — overlaps the next epoch's compute
                ckpt_manager.save(epoch + 1, state)
            if eval_hook is not None:
                eval_hook(self, state, epoch)
        if ckpt_manager is not None:
            ckpt_manager.wait_until_finished()
        if settings.get("plot_loss") and snapshot_dir and history:
            self._plot_loss_curve(history, f"{snapshot_dir}/loss.png")
        return state, history

    @staticmethod
    def _plot_loss_curve(history, path):
        """Loss-curve artifact (file-based twin of the reference's live
        matplotlib plot, trainer.py:265-288)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure()
        plt.plot([h["epoch"] for h in history],
                 [h["loss"] for h in history], "b-o")
        plt.xlabel("epoch")
        plt.ylabel("training loss")
        fig.savefig(path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return path
