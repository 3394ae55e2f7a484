"""Optimizer construction: Adam/SGD + multi-step LR decay via optax.

Spec: /root/reference/libs/optimizer/optimizer.py:9-41 (torch Adam/SGD with
MultiStepLR stepping once per epoch).
"""

from __future__ import annotations

import optax


def multistep_schedule(base_lr: float, milestones, gamma: float,
                       steps_per_epoch: int):
    """MultiStepLR: lr *= gamma at each milestone epoch."""
    boundaries = {int(m) * int(steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def prepare_optim(cfgs: dict, steps_per_epoch: int = 1):
    """(optimizer, schedule_fn) from the reference config schema."""
    opt_cfg = cfgs["optimizer"]
    schedule = multistep_schedule(
        float(opt_cfg["lr"]), opt_cfg.get("milestones", []),
        float(opt_cfg.get("gamma", 0.1)), steps_per_epoch)
    weight_decay = float(opt_cfg.get("weight_decay", 0.0))
    kind = opt_cfg.get("optim_type", "adam")
    if kind == "adam":
        # torch Adam folds weight decay into the gradient before the moment
        # updates (not decoupled AdamW) — replicate that ordering
        tx = optax.chain(optax.add_decayed_weights(weight_decay),
                         optax.adam(schedule)) \
            if weight_decay else optax.adam(schedule)
    elif kind == "sgd":
        tx = optax.sgd(schedule, momentum=float(opt_cfg.get("momentum", 0.9)))
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    else:
        raise NotImplementedError(kind)
    return tx, schedule
