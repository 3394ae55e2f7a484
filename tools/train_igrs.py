"""Stage-2 training CLI: the HRNet keypoint (IGR) model -> HC checkpoint.

Mirrors /root/reference/tools/train_IGRs.py: --cfg <yaml>.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from egonet_tpu import config as cfg_mod
from egonet_tpu.data import kitti as libkitti
from egonet_tpu.utils.logger import get_logger


def main(argv=None):
    from egonet_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    cfgs = cfg_mod.parse_args(argv)
    logger, out_dir = get_logger(cfgs)

    import jax
    import jax.numpy as jnp
    from egonet_tpu.parallel import mesh as pmesh
    from egonet_tpu.train.igrs import IGRTrainer
    from egonet_tpu.io import checkpoint

    train_set = libkitti.KITTIDataset(cfgs, "train", logger)
    valid_set = libkitti.KITTIDataset(cfgs, "valid", logger)

    mesh = pmesh.make_mesh() if len(jax.devices()) > 1 else None
    # steps/epoch from the POST-host-shard record count: the loader shards
    # records across processes, so scheduling MultiStepLR boundaries off
    # the full count would fire LR decay ~process_count epochs late on
    # multi-host rigs (host_shard wrap-pads every shard to the ceil length)
    batch = int(cfgs["training_settings"]["batch_size"])
    per_host = -(-len(train_set.records) // max(1, jax.process_count()))
    loader_steps = max(1, -(-per_host // batch))
    dtype = jnp.bfloat16 if cfgs.get("bf16", False) else jnp.float32
    trainer = IGRTrainer(cfgs, mesh=mesh, dtype=dtype,
                         steps_per_epoch=loader_steps, logger=logger)

    # resume from a previous run's native checkpoint
    variables = None
    resume_path = cfgs["training_settings"].get("resume")
    if resume_path and isinstance(resume_path, str) \
            and os.path.exists(resume_path):
        logger.info(f"resuming from {resume_path}")
        variables = checkpoint.load_variables(resume_path)

    # warm start from a pretrained torch checkpoint when configured
    # (layer-filtered; shared helper also exercised by the closed-loop gate)
    if variables is None:
        variables = checkpoint.warm_start_variables(cfgs, trainer.model,
                                                    logger=logger)

    # parameter/FLOPs summary (reference get_model_summary at startup)
    from egonet_tpu.utils.summary import model_summary, per_layer_summary
    import jax.numpy as jnp_
    w, h = cfgs["heatmapModel"]["input_size"]
    summary = model_summary(trainer.model, jnp_.zeros((1, h, w, 3)))
    logger.info(summary["text"])
    if cfgs.get("training_settings", {}).get("verbose_summary"):
        # the reference's verbose per-layer table (utils.py:35-147)
        logger.info("\n" + per_layer_summary(trainer.model,
                                             jnp_.zeros((1, h, w, 3))))

    state = trainer.init_state(0, variables=variables)
    ckpt_out = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_out, exist_ok=True)

    # exact resume: training_settings.exact_resume names an orbax
    # CheckpointManager directory holding FULL train states (params +
    # batch_stats + opt_state + step).  Unlike the msgpack `resume` warm
    # start above, this restores the Adam moments and schedule position
    # and continues from the saved epoch.  (The reference's `resume` key
    # is a dead placeholder, configs/KITTI_train_IGRs.yml:156.)
    ckpt_manager, start_epoch = None, 0
    exact_dir = cfgs["training_settings"].get("exact_resume")
    if exact_dir:
        from egonet_tpu.io.orbax_ckpt import TrainCheckpointManager
        if not isinstance(exact_dir, str):
            exact_dir = os.path.join(ckpt_out, "orbax")
        ckpt_manager = TrainCheckpointManager(exact_dir)
        latest = ckpt_manager.latest_step()
        if latest is not None:
            logger.info(f"exact resume from {exact_dir} @ epoch {latest}")
            state = ckpt_manager.restore(state, step=latest)
            if mesh is not None:
                state = pmesh.replicate_pytree(state, mesh)
            start_epoch = int(latest)

    state, history = trainer.fit(
        train_set.records, valid_set.records, state=state,
        snapshot_dir=ckpt_out,
        ss_record=getattr(train_set, "ss_record", None),
        ss_img_root=getattr(train_set, "ss_img_root", ""),
        ss_max_per_img=getattr(train_set, "ss_max_per_img", 6),
        ckpt_manager=ckpt_manager, start_epoch=start_epoch)
    if ckpt_manager is not None:
        ckpt_manager.close()
    logger.info(f"training done: {history[-1] if history else 'no steps'}")

    # save both native (orbax/msgpack) and torch-compatible checkpoints
    ckpt_dir = ckpt_out
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    checkpoint.save_variables(os.path.join(ckpt_dir, "HC.msgpack"), variables)
    checkpoint.save_torch_state_dict(os.path.join(ckpt_dir, "HC.pth"),
                                     variables)
    logger.info(f"saved HC checkpoints under {ckpt_dir}")


if __name__ == "__main__":
    from egonet_tpu.utils.runtime import clean_exit
    main()
    clean_exit(0)
