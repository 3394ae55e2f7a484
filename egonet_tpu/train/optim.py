"""Optimizer construction: Adam/SGD + multi-step LR decay via optax,
plus prefix-based parameter freezing.

Spec: /root/reference/libs/optimizer/optimizer.py:9-41 (torch Adam/SGD with
MultiStepLR stepping once per epoch); layer freezing mirrors
hrnet.py:669-686 (named parameters whose name starts with a configured
prefix receive no updates).
"""

from __future__ import annotations

import optax


def multistep_schedule(base_lr: float, milestones, gamma: float,
                       steps_per_epoch: int):
    """MultiStepLR: lr *= gamma at each milestone epoch."""
    boundaries = {int(m) * int(steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def is_frozen(name: str, freeze_names) -> bool:
    return any(name.startswith(prefix) for prefix in freeze_names)


def freeze_mask(params, freeze_names):
    """Pytree of bools: True = trainable.  Top-level module names in our
    models are the torch key prefixes, so reference freeze lists apply
    directly."""
    import jax
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for path, _ in flat:
        name = ".".join(str(getattr(p, "key", getattr(p, "idx", "")))
                        for p in path)
        leaves.append(not is_frozen(name, freeze_names))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def apply_freezing(tx, params, freeze_names):
    """Wrap an optax transform so frozen parameters receive zero updates.

    optax.masked passes un-masked leaves through unchanged, so freezing is
    the composition: zero the frozen gradients, then run the optimizer on
    the trainable subset only.
    """
    if not freeze_names:
        return tx
    import jax
    trainable = freeze_mask(params, freeze_names)
    frozen = jax.tree_util.tree_map(lambda t: not t, trainable)
    return optax.chain(
        optax.masked(optax.set_to_zero(), frozen),
        optax.masked(tx, trainable),
    )


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
