"""Training-step differential against the reference PyTorch implementation.

The whole-pipeline differential (test_full_pipeline_differential.py) proves
the INFERENCE path composes correctly; these tests prove the TRAINING
dynamics match: gradients of the composite keypoint loss through the full
HRNet (train-mode BatchNorm), gradients of the cross-ratio prior, and
multi-step optimizer trajectories (SGD+momentum, Adam + weight decay +
MultiStepLR) against torch.autograd / torch.optim on shared weights.

Oracle composition mirrors the reference trainer:
  * loss = w_hm*calc_hm_loss + w_coor*calc_coor_loss + w_cr*calc_cr_loss
    (libs/loss/function.py:95-168, weights per configs/KITTI_train_IGRs.yml
    loss_weight_list) with the fore-shortening cr mask (function.py:138-153);
  * optimizers per libs/optimizer/optimizer.py:9-41 (Adam/SGD + MultiStepLR
    stepped once per epoch).

The model-level differentials run in float64, where the comparison is EXACT
(measured 1e-13 gradient agreement): in float32 the two implementations
round independently, and a single pre-activation within fp32 noise of zero
flips its ReLU gate between them, moving whole gradient contributions —
a legitimate subgradient difference, not an implementation bug (verified:
exactly one flipped gate out of 524k reproduced the entire fp32 deviation,
while torch-fp32-vs-fp64 stays at 1e-5 only because both runs share one
rounding lineage).  Hunting this is also what surfaced a REAL defect fixed
in the models: flax's default fast (one-pass) BatchNorm variance loses ~3
digits of train-mode gradient accuracy on post-ReLU activations.

Known, bounded semantic difference (documented, not hidden): torch updates
BatchNorm ``running_var`` with the UNBIASED batch variance (Bessel n/(n-1))
while flax uses the biased one, so after a train step the running variances
differ by at most momentum/(n-1) relative — negligible at production batch
sizes (n = N*H*W >= 1e5) and asserted within an explicit bound here.  Batch
statistics used for normalization (and therefore every gradient) are biased
in BOTH frameworks and match exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests import fixtures, refutil

pytestmark = pytest.mark.skipif(not refutil.reference_available(),
                                reason="reference checkout not available")
refutil.ensure_reference_importable()

SKIP_STATS = ("running_mean", "running_var", "num_batches_tracked")


def _small_cfg():
    from egonet_tpu.config import default_demo_config
    cfg = fixtures.shrink_hrnet(default_demo_config(), num_blocks=2,
                                num_modules=(1, 2, 2))
    hm = cfg["heatmapModel"]
    hm["init_weights"] = False
    hm["loss_spec_list"] = ["mse", "l1", "sl1"]
    hm["loss_weight_list"] = [1.0, 0.1, 0.01]
    hm["cr_loss_threshold"] = 0.15
    return cfg


def _to_named(tree, batch_stats):
    """Map a flax params-shaped pytree to torch parameter names."""
    from egonet_tpu.io import torch_convert as tc
    named = tc.flax_to_torch({"params": tree, "batch_stats": batch_stats})
    return {k: np.asarray(v) for k, v in named.items()
            if not k.endswith(SKIP_STATS)}


def _compare_named(got: dict, ref: dict, tol: float, what: str):
    """Per-tensor comparison at atol = tol * max|ref tensor|."""
    assert set(got) == set(ref), (sorted(set(got) ^ set(ref))[:5], what)
    gscale = max((float(np.abs(np.asarray(v)).max()) for v in ref.values()),
                 default=1.0) or 1.0
    for k in sorted(ref):
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        if max(float(np.abs(r).max()), float(np.abs(g).max())) \
                < 1e-14 * gscale:
            # analytically-zero tensor (e.g. a bias immediately consumed by
            # BatchNorm's mean subtraction): both sides are pure fp64
            # rounding noise — comparing noise to noise proves nothing
            continue
        scale = max(float(np.abs(r).max()), 1e-8)
        np.testing.assert_allclose(
            g, r, rtol=0, atol=tol * scale,
            err_msg=f"{what}: {k} (scale {scale:.3g})")


def _torch_param_grads(model):
    out = {}
    for name, p in model.named_parameters():
        out[name] = (np.zeros(p.shape, np.float64) if p.grad is None
                     else p.grad.detach().numpy().copy())
    return out


def _f64_tree(tree):
    # copy=True matters: torch_to_flax returns zero-copy numpy VIEWS of the
    # live torch parameter storage, so a later torch opt.step() would mutate
    # the "converted" tree in place and corrupt the differential
    return jax.tree_util.tree_map(
        lambda v: np.array(v, np.float64, copy=True), tree)


def test_cross_ratio_gradient_parity(rng):
    """d(cr loss)/d(coords) against torch autograd through the reference
    calc_cross_ratio_loss + get_cr_mask (function.py:113-153)."""
    import torch
    from libs.loss.function import JointsCompositeLoss
    from libs.dataset.KITTI.car_instance import cr_indices_dict
    from egonet_tpu.train import losses

    coords_np = rng.rand(3, 33, 2).astype(np.float32)
    ref_loss = JointsCompositeLoss(["mse", "l1", "sl1"], (64, 64), (16, 16),
                                   loss_weights=[1.0, 1.0, 1.0],
                                   target_cr=4.0 / 3.0)
    ref_loss.cr_indices = cr_indices_dict["bbox12"]
    mask = ref_loss.get_cr_mask(coords_np, threshold=0.15)
    assert float(mask.sum()) > 0            # a zero mask would test nothing

    coords_t = torch.from_numpy(coords_np.copy()).requires_grad_(True)
    ref_val = ref_loss.calc_cross_ratio_loss(coords_t, 4.0 / 3.0, mask)
    ref_val.backward()
    ref_grad = coords_t.grad.numpy()

    val_fn = lambda c: losses.cross_ratio_loss(c, distance_threshold=0.15)
    got_val, got_grad = jax.value_and_grad(val_fn)(jnp.asarray(coords_np))
    np.testing.assert_allclose(float(got_val), float(ref_val.detach()),
                               rtol=1e-5)
    scale = max(float(np.abs(ref_grad).max()), 1e-8)
    np.testing.assert_allclose(np.asarray(got_grad), ref_grad,
                               rtol=0, atol=1e-5 * scale)


def test_hrnet_composite_loss_sgd_steps_parity(rng):
    """Two SGD(momentum=0.9) steps of the full composite loss through the
    HRNet (train-mode BN) match torch.autograd + torch.optim.SGD on shared
    weights — in float64, where the agreement is exact: loss values, every
    parameter gradient (1e-9), stepped parameters, and updated BN running
    statistics."""
    import torch
    import optax
    
    from libs.model.heatmapModel.hrnet import get_pose_net
    from libs.loss.function import JointsCompositeLoss
    from libs.dataset.KITTI.car_instance import cr_indices_dict
    from egonet_tpu.models.hrnet import build_hrnet
    from egonet_tpu.io import torch_convert as tc
    from egonet_tpu.train import losses
    from egonet_tpu.ops.keypoints import gaussian_targets

    cfg = _small_cfg()
    torch.manual_seed(3)
    ref_model = get_pose_net(cfg, is_train=False)
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.75)
    ref_model = ref_model.double()
    ref_model.train()

    n, k = 4, cfg["heatmapModel"]["num_joints"]
    x = rng.rand(n, 3, 64, 64).astype(np.float64)
    joints = rng.uniform(8.0, 56.0, (n, k, 2)).astype(np.float64)

    w_hm, w_coor, w_cr = [float(w)
                          for w in cfg["heatmapModel"]["loss_weight_list"]]
    ref_loss = JointsCompositeLoss(
        ["mse", "l1", "sl1"],
        tuple(cfg["heatmapModel"]["input_size"]), (16, 16),
        loss_weights=[w_hm, w_coor, w_cr], target_cr=4.0 / 3.0)
    ref_loss.cr_indices = cr_indices_dict["bbox12"]
    loss_cfg = losses.CompositeLossConfig(cfg)

    with jax.enable_x64(True):
        variables = _f64_tree(tc.torch_to_flax(dict(ref_model.state_dict())))
        model = build_hrnet(cfg, dtype=jnp.float64)
        targets = np.asarray(gaussian_targets(
            jnp.asarray(joints), jnp.ones((n, k), jnp.float64),
            (16, 16), (64, 64), sigma=1.0)[0])

        def our_loss(params, batch_stats):
            outputs, new_state = model.apply(
                {"params": params, "batch_stats": batch_stats},
                jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
                mutable=["batch_stats"])
            total, _ = losses.composite_loss(
                outputs, jnp.asarray(targets), jnp.asarray(joints),
                loss_cfg, apply_cr=True)
            return total, new_state["batch_stats"]

        grad_fn = jax.jit(jax.value_and_grad(our_loss, has_aux=True))

        lr, momentum = 0.05, 0.9
        opt = torch.optim.SGD(ref_model.parameters(), lr=lr,
                              momentum=momentum)
        tx = optax.sgd(lr, momentum=momentum)
        params, bstats = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)

        for step in range(2):
            opt.zero_grad()
            maps_t, coords_t = ref_model(torch.from_numpy(x))
            cr_mask = ref_loss.get_cr_mask(
                coords_t.detach().numpy(),
                cfg["heatmapModel"]["cr_loss_threshold"])
            assert float(cr_mask.sum()) > 0
            ref_total = (
                w_hm * ref_loss.calc_hm_loss(maps_t,
                                             torch.from_numpy(targets))
                + w_coor * ref_loss.calc_coor_loss(
                    coords_t, torch.from_numpy(joints.copy()))
                + w_cr * ref_loss.calc_cross_ratio_loss(
                    coords_t, 4.0 / 3.0, cr_mask))
            ref_total.backward()

            (got_total, new_bstats), grads = grad_fn(params, bstats)
            np.testing.assert_allclose(float(got_total),
                                       float(ref_total.detach()),
                                       rtol=1e-12, err_msg=f"step {step}")
            _compare_named(_to_named(grads, bstats),
                           _torch_param_grads(ref_model),
                           tol=1e-9, what=f"grads step {step}")

            opt.step()
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            bstats = new_bstats

        ref_sd = {kk: v.detach().numpy() for kk, v in
                  ref_model.state_dict().items()}
        _compare_named(_to_named(params, bstats),
                       {kk: v for kk, v in ref_sd.items()
                        if not kk.endswith(SKIP_STATS)},
                       tol=1e-10, what="stepped params")

        # BN running statistics: means match exactly; variances differ only
        # by torch's Bessel correction on the update (<= momentum/(n-1)
        # relative; smallest n here = 4 * 2 * 2 spatial)
        our_sd = tc.flax_to_torch({"params": params, "batch_stats": bstats})
        for kk, ref_v in ref_sd.items():
            if kk.endswith("running_mean"):
                scale = max(float(np.abs(ref_v).max()), 1e-6)
                np.testing.assert_allclose(np.asarray(our_sd[kk]), ref_v,
                                           rtol=0, atol=1e-10 * scale,
                                           err_msg=kk)
            elif kk.endswith("running_var"):
                ours = np.asarray(our_sd[kk])
                np.testing.assert_allclose(ours, ref_v, rtol=8e-2,
                                           err_msg=kk)
                assert np.all(ref_v - ours >= -1e-12), (
                    f"{kk}: biased update must not exceed torch's unbiased")


def test_lifter_sgd_step_parity(rng):
    """One SGD step of MSELoss1D through the FC lifter (train-mode BN1d,
    dropout disabled on both sides) matches torch exactly in float64."""
    import torch
    import optax
    
    from libs.model.FCmodel import get_fc_model
    from egonet_tpu.models.fc_lifter import build_fc_model
    from egonet_tpu.io import torch_convert as tc
    from egonet_tpu.train import losses
    from egonet_tpu.config import default_demo_config

    cfg = default_demo_config()
    torch.manual_seed(4)
    ref = get_fc_model(1, cfg, input_size=66, output_size=96)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.2)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
    ref = ref.double()
    ref.train()

    x = rng.randn(64, 66).astype(np.float64)
    y = rng.randn(64, 96).astype(np.float64)

    lr = 0.02
    opt = torch.optim.SGD(ref.parameters(), lr=lr)
    loss_t = torch.nn.functional.mse_loss(ref(torch.from_numpy(x)),
                                          torch.from_numpy(y))
    opt.zero_grad()
    loss_t.backward()

    with jax.enable_x64(True):
        variables = _f64_tree(tc.torch_to_flax(dict(ref.state_dict())))
        model = build_fc_model(cfg, dtype=jnp.float64)

        def our_loss(params, batch_stats):
            out, new_state = model.apply(
                {"params": params, "batch_stats": batch_stats},
                jnp.asarray(x), train=True, apply_dropout=False,
                mutable=["batch_stats"])
            return losses.mse_loss_1d(out, jnp.asarray(y)), \
                new_state["batch_stats"]

        (got_loss, new_bs), grads = jax.value_and_grad(
            our_loss, has_aux=True)(variables["params"],
                                    variables["batch_stats"])
        np.testing.assert_allclose(float(got_loss), float(loss_t.detach()),
                                   rtol=1e-12)
        _compare_named(_to_named(grads, variables["batch_stats"]),
                       _torch_param_grads(ref), tol=1e-12,
                       what="lifter grads")

        opt.step()
        tx = optax.sgd(lr)
        updates, _ = tx.update(grads, tx.init(variables["params"]),
                               variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
                  if not k.endswith(SKIP_STATS)}
        _compare_named(_to_named(params, new_bs), ref_sd, tol=1e-12,
                       what="lifter stepped params")


def test_lifter_adam_multistep_trajectory_parity(rng):
    """Four optimizer steps through prepare_optim (Adam + weight decay +
    MultiStepLR with a milestone INSIDE the window) track
    torch.optim.Adam + MultiStepLR in float64: the decayed-epoch boundary
    semantics, bias correction, eps placement and torch's grad-folded
    (non-decoupled) weight decay all have to line up for the trajectories
    to stay within 1e-9 of each other."""
    import torch
    import optax
    
    from libs.model.FCmodel import get_fc_model
    from egonet_tpu.models.fc_lifter import build_fc_model
    from egonet_tpu.io import torch_convert as tc
    from egonet_tpu.train import losses, optim
    from egonet_tpu.config import default_demo_config

    cfg = default_demo_config()
    cfg["optimizer"] = {"optim_type": "adam", "lr": 0.01,
                        "milestones": [2], "gamma": 0.1,
                        "weight_decay": 0.01}
    torch.manual_seed(5)
    ref = get_fc_model(1, cfg, input_size=66, output_size=96)
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
    ref = ref.double()
    ref.train()

    opt = torch.optim.Adam(ref.parameters(), lr=0.01, weight_decay=0.01)
    sche = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[2],
                                                gamma=0.1)

    with jax.enable_x64(True):
        variables = _f64_tree(tc.torch_to_flax(dict(ref.state_dict())))
        model = build_fc_model(cfg, dtype=jnp.float64)
        tx, _ = optim.prepare_optim(cfg, steps_per_epoch=1)
        params, bstats = variables["params"], variables["batch_stats"]
        opt_state = tx.init(params)

        def our_loss(p, bs, xb, yb):
            out, new_state = model.apply(
                {"params": p, "batch_stats": bs}, xb, train=True,
                apply_dropout=False, mutable=["batch_stats"])
            return losses.mse_loss_1d(out, yb), new_state["batch_stats"]

        grad_fn = jax.jit(jax.value_and_grad(our_loss, has_aux=True))

        for epoch in range(4):
            xb = rng.randn(32, 66).astype(np.float64)
            yb = rng.randn(32, 96).astype(np.float64)
            opt.zero_grad()
            torch.nn.functional.mse_loss(ref(torch.from_numpy(xb)),
                                         torch.from_numpy(yb)).backward()
            opt.step()
            sche.step()

            (_, new_bs), grads = grad_fn(params, bstats,
                                         jnp.asarray(xb), jnp.asarray(yb))
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            bstats = new_bs

        ref_sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
                  if not k.endswith(SKIP_STATS)}
        _compare_named(_to_named(params, bstats), ref_sd, tol=1e-9,
                       what="adam trajectory params")
