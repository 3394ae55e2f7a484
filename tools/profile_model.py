"""Profile the fused inference program (or one training step) on the
current accelerator and print a per-HLO-category / per-shape summary.

Usage:
  python tools/profile_model.py --cfg <yaml> [--train] [--batch N]
                                [--trace-dir DIR]

This operationalizes the roofline workflow behind docs/performance.md:
capture a device trace of the steady-state step, then aggregate where the
time and HBM bytes go.  The raw trace stays on disk for
TensorBoard/Perfetto.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--train", action="store_true",
                        help="profile one stage-2 training step instead of "
                             "the fused inference program")
    parser.add_argument("--batch", type=int, default=384,
                        help="instance count (inference mode)")
    parser.add_argument("--trace-dir", default="/tmp/egonet_profile")
    parser.add_argument("--iters", type=int, default=2)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from egonet_tpu.config import load_config
    from egonet_tpu.utils import profiling
    from egonet_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    cfgs = load_config(args.cfg)
    rng = np.random.RandomState(0)

    if args.train:
        from egonet_tpu.train.igrs import IGRTrainer
        trainer = IGRTrainer(cfgs, dtype=jnp.bfloat16)
        state = trainer.init_state(0)
        m = 140
        batch = {
            "images": rng.randint(0, 255, (24, 384, 1280, 3), np.uint8),
            "inv_mats": np.tile(np.array([[0.5, 0, 10], [0, 0.5, 10]],
                                         np.float32)[None], (m, 1, 1)),
            "img_idx": rng.randint(0, 24, m).astype(np.int32),
            "joints": rng.uniform(5, 250, (m, 33, 3)).astype(np.float32),
            "mask": np.ones(m, np.float32),
            "sup_mask": np.ones(m, np.float32),
        }
        batch["joints"][..., 2] = 1.0

        def step():
            nonlocal state
            state, metrics = trainer.train_step(state, batch, apply_cr=True)
            jax.block_until_ready(metrics)
    else:
        from egonet_tpu.models.egonet import EgoNet
        from bench import build_core_inputs
        model = EgoNet(cfgs, pre_trained=False, dtype=jnp.bfloat16)
        ls = {k: jnp.asarray(v) for k, v in model.ls_stats.items()}
        fn = model._get_jitted("proj")
        dev_args = build_core_inputs(model, args.batch)

        def step():
            jax.block_until_ready(fn(model.hrnet_vars, model.lifter_vars,
                                     ls, *dev_args))

    for _ in range(3):          # compile + warm
        step()
    with profiling.trace(args.trace_dir):
        for _ in range(args.iters):
            step()
    summary = profiling.summarize_trace(args.trace_dir, iters=args.iters)
    print(summary["text"])
    print(f"trace: {args.trace_dir}")


if __name__ == "__main__":
    from egonet_tpu.utils.runtime import clean_exit
    main()
    clean_exit(0)
