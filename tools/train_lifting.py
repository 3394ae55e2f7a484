"""Stage-1 training CLI: the FC lifter -> L checkpoint + LS statistics.

Mirrors /root/reference/tools/train_lifting.py: --cfg <yaml>.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from egonet_tpu import config as cfg_mod
from egonet_tpu.data import kitti as libkitti
from egonet_tpu.utils.logger import get_logger


def main(argv=None):
    from egonet_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    cfgs = cfg_mod.parse_args(argv)
    logger, out_dir = get_logger(cfgs)

    import jax
    from egonet_tpu.parallel import mesh as pmesh
    from egonet_tpu.train.lifting import LiftingTrainer
    from egonet_tpu.io import checkpoint

    train_set, valid_set = libkitti.prepare_data(cfgs, logger)
    logger.info(f"lifting pairs: train {len(train_set.input)}, "
                f"valid {len(valid_set.input)}")

    # derive lifter input/output sizes from the representation when the
    # config leaves them implicit (reference get_input_output_size,
    # car_instance.py:688-703)
    cfgs["FCModel"].setdefault("input_size", int(train_set.input.shape[1]))
    cfgs["FCModel"].setdefault("output_size", int(train_set.output.shape[1]))

    batch = int(cfgs["training_settings"].get("batch_size", 2048))
    # steps/epoch from the POST-host-shard pair count (ArrayBatchLoader
    # shards rows across processes; see tools/train_igrs.py)
    per_host = -(-len(train_set.input) // max(1, jax.process_count()))
    steps = max(1, per_host // batch)
    mesh = pmesh.make_mesh() if len(jax.devices()) > 1 else None
    trainer = LiftingTrainer(cfgs, mesh=mesh, steps_per_epoch=steps,
                             logger=logger)

    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)

    # exact resume: same contract as tools/train_igrs.py — an orbax
    # CheckpointManager directory of FULL train states (params +
    # batch_stats + opt_state + step), restoring Adam moments and the
    # schedule position, continuing from the saved epoch.
    ckpt_manager, start_epoch, state = None, 0, None
    exact_dir = cfgs["training_settings"].get("exact_resume")
    if exact_dir:
        from egonet_tpu.io.orbax_ckpt import TrainCheckpointManager
        if not isinstance(exact_dir, str):
            exact_dir = os.path.join(ckpt_dir, "orbax")
        ckpt_manager = TrainCheckpointManager(exact_dir)
        latest = ckpt_manager.latest_step()
        if latest is not None:
            logger.info(f"exact resume from {exact_dir} @ epoch {latest}")
            state = trainer.init_state(0)
            state = ckpt_manager.restore(state, step=latest)
            if mesh is not None:
                state = pmesh.replicate_pytree(state, mesh)
            start_epoch = int(latest)

    state, history = trainer.fit(train_set, valid_set, state=state,
                                 ckpt_manager=ckpt_manager,
                                 start_epoch=start_epoch)
    if ckpt_manager is not None:
        ckpt_manager.close()

    if cfgs.get("evaluate") or cfgs.get("visualize"):
        trainer.evaluate(
            state, valid_set,
            visualize_dir=out_dir if cfgs.get("visualize") else None)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    checkpoint.save_variables(os.path.join(ckpt_dir, "L.msgpack"), variables)
    checkpoint.save_torch_state_dict(os.path.join(ckpt_dir, "L.pth"),
                                     variables)
    checkpoint.save_lifter_stats(os.path.join(ckpt_dir, "LS.npy"),
                                 train_set.statistics)
    logger.info(f"saved L.pth/L.msgpack/LS.npy under {ckpt_dir}")


if __name__ == "__main__":
    from egonet_tpu.utils.runtime import clean_exit
    main()
    clean_exit(0)
