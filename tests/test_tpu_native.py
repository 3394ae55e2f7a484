"""PoseNetTPU (the TPU-native model family, models/tpu_native.py): head
contract, factory dispatch, drop-in behavior in the trainer and the fused
EgoNet pipeline, and checkpoint interchange.

No reference counterpart exists for this model; these tests pin the
CONTRACT it shares with hrnet (so every consumer stays model-agnostic)
rather than any torch parity.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egonet_tpu.config import default_demo_config, load_config
from egonet_tpu.data import kitti
from egonet_tpu.models.factory import build_heatmap_model
from egonet_tpu.models.initialization import numpy_init
from tests import fixtures


def native_cfg():
    return fixtures.shrink_tpu_native(default_demo_config())


def _init(model, in_ch=3, size=64):
    return numpy_init(model, 0, jnp.zeros((1, size, size, in_ch)))


def test_factory_dispatch():
    from egonet_tpu.models.hrnet import PoseHighResolutionNet
    from egonet_tpu.models.resnet import PoseResNet
    from egonet_tpu.models.tpu_native import PoseNetTPU
    cfg = default_demo_config()
    assert isinstance(build_heatmap_model(cfg), PoseHighResolutionNet)
    cfg["heatmapModel"]["name"] = "tpu_native"
    cfg["heatmapModel"]["extra"] = {}
    assert isinstance(build_heatmap_model(cfg), PoseNetTPU)
    cfg["heatmapModel"]["name"] = "resnet"
    cfg["heatmapModel"]["extra"] = {"num_layers": 18,
                                    "num_deconv_layers": 2,
                                    "num_deconv_filters": [16, 16],
                                    "num_deconv_kernels": [4, 4],
                                    "final_conv_kernel": 1,
                                    "deconv_with_bias": False}
    assert isinstance(build_heatmap_model(cfg), PoseResNet)
    cfg["heatmapModel"]["name"] = "nope"
    with pytest.raises(NotImplementedError):
        build_heatmap_model(cfg)


def test_head_contract_shapes():
    cfg = native_cfg()
    k = cfg["heatmapModel"]["num_joints"]
    for head, check in (
        ("coordinates", lambda o: (o[0].shape == (2, k, 16, 16)
                                   and o[1].shape == (2, k, 2))),
        ("heatmap", lambda o: o.shape == (2, k, 16, 16)),
        ("angleregression", lambda o: o.shape == (2, 2)),
    ):
        cfg["heatmapModel"]["head_type"] = head
        model = build_heatmap_model(cfg)
        v = _init(model)
        out = model.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
        assert check(out), head
        # train mode mutates batch_stats and keeps the same output contract
        out2, st = model.apply(v, jnp.ones((2, 64, 64, 3)) * 0.3,
                               train=True, mutable=["batch_stats"])
        assert "batch_stats" in st
        assert check(out2), f"{head} (train)"


def test_coords_bounded_and_finite():
    cfg = native_cfg()
    model = build_heatmap_model(cfg)
    v = _init(model)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32))
    maps, coords = model.apply(v, x, train=False)
    coords = np.asarray(coords)
    assert np.all(np.isfinite(np.asarray(maps)))
    assert np.all((coords >= 0) & (coords <= 1)), "sigmoid contract"


def test_add_xy_five_channels():
    cfg = native_cfg()
    cfg["heatmapModel"]["add_xy"] = True
    model = build_heatmap_model(cfg)
    assert model.in_channels == 5
    v = _init(model, in_ch=5)
    maps, coords = model.apply(v, jnp.zeros((2, 64, 64, 5)), train=False)
    assert coords.shape == (2, cfg["heatmapModel"]["num_joints"], 2)


def test_bf16_policy_matches_fp32_closely():
    """bf16 compute returns fp32 outputs near the fp32 run (same policy
    budget as the hrnet precision tests)."""
    cfg = native_cfg()
    m32 = build_heatmap_model(cfg, dtype=jnp.float32)
    m16 = build_heatmap_model(cfg, dtype=jnp.bfloat16)
    v = _init(m32)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    maps32, c32 = m32.apply(v, x, train=False)
    maps16, c16 = m16.apply(v, x, train=False)
    assert maps16.dtype == jnp.float32 and c16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(c16), np.asarray(c32), atol=0.05)


def test_torch_interchange_roundtrip():
    """flax -> torch-style state_dict -> flax is the identity, including
    the depthwise conv kernels ([3,3,1,C] <-> [C,1,3,3]) and shortcut
    convs this family introduces."""
    from egonet_tpu.io import torch_convert as tc
    cfg = native_cfg()
    model = build_heatmap_model(cfg)
    v = _init(model)
    variables = {"params": v["params"], "batch_stats": v["batch_stats"]}
    named = tc.flax_to_torch(variables)
    assert any(".dw." in k or k.endswith(".dw.weight") for k in named), \
        sorted(named)[:5]
    back = tc.torch_to_flax(named)
    flat_a = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert set(map(str, flat_a)) == set(map(str, flat_b))
    for path, val in flat_a.items():
        np.testing.assert_array_equal(np.asarray(val),
                                      np.asarray(flat_b[path]), str(path))


def _train_cfg(root):
    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")
    cfg = load_config(os.path.join(here, "KITTI_tpu_native.yml"))
    cfg["dataset"]["root"] = root
    fixtures.shrink_tpu_native(cfg)
    cfg["training_settings"]["batch_size"] = 1
    cfg["training_settings"]["total_epochs"] = 1
    return cfg


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native")
    root, pred_dir = fixtures.make_kitti_root(tmp, n_images=2,
                                              with_predictions=True)
    return root, pred_dir


def test_igr_trainer_steps_native_model(kitti_root):
    """The shipped training config drives IGRTrainer with the native
    backbone: finite decreasing-capable loss, parameters move."""
    from egonet_tpu.train.igrs import IGRTrainer
    from egonet_tpu.data.loader import IGRBatchLoader
    root, _ = kitti_root
    cfg = _train_cfg(root)
    ds = kitti.KITTIDataset(cfg, "train")
    trainer = IGRTrainer(cfg)
    loader = IGRBatchLoader(ds.records, cfg, train=True)
    batch = next(loader.epoch())
    state = trainer.init_state(0)
    before = [np.asarray(p).copy() for p in
              jax.tree_util.tree_leaves(state.params)]
    losses = []
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch, apply_cr=False)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses
    after = [np.asarray(p) for p in jax.tree_util.tree_leaves(state.params)]
    assert any(np.abs(b - a).max() > 0 for b, a in zip(before, after))


def test_egonet_pipeline_native_backbone(kitti_root):
    """The fused EgoNet program accepts the native backbone unchanged:
    full forward on the synthetic fixture produces the standard record
    structure with finite angles."""
    from egonet_tpu.models.egonet import EgoNet
    root, _ = kitti_root
    cfg = fixtures.shrink_tpu_native(default_demo_config())
    cfg["dataset"]["root"] = root
    model = EgoNet(cfg, pre_trained=False)
    ds = kitti.get_dataset(cfg, split="valid")
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]],
             "raw_txt_format": [rec["raw_txt_format"]]}
    records = model(annot)
    out = records[path]
    n = len(rec["bbox_2d"])
    assert len(out["kpts_2d_pred"]) == n
    assert out["kpts_3d_pred"].shape == (n, 32, 3)
    assert out["euler_angles"].shape == (n, 3)
    assert np.all(np.isfinite(out["euler_angles"]))
    assert np.all(np.abs(out["alphas"]) <= np.pi + 1e-6)


def test_native_sharded_matches_single(kitti_root):
    """The native model crosses the 8-device CPU mesh: sharded fused
    inference matches the single-device run."""
    from egonet_tpu.models.egonet import EgoNet
    from egonet_tpu.parallel import mesh as pmesh
    root, _ = kitti_root
    cfg = fixtures.shrink_tpu_native(default_demo_config())
    cfg["dataset"]["root"] = root
    ds = kitti.get_dataset(cfg, split="valid")
    name = ds.image_names[0]
    rec = ds.annot_dict[name]
    path = ds.paths.image_path(name)
    annot = {"path": [path], "boxes": [rec["bbox_2d"]], "K": [rec["K"]],
             "raw_txt_format": [rec["raw_txt_format"]]}
    single = EgoNet(cfg, pre_trained=False, rng_seed=7)(annot)[path]
    mesh = pmesh.make_mesh()
    sharded = EgoNet(cfg, pre_trained=False, rng_seed=7,
                     mesh=mesh)(annot)[path]
    np.testing.assert_allclose(sharded["euler_angles"],
                               single["euler_angles"], atol=1e-4)
    # random-weight lifted points reach O(1e3); allow fp32 reduction-order
    # noise across the mesh (relative 1e-5)
    np.testing.assert_allclose(sharded["kpts_3d_pred"],
                               single["kpts_3d_pred"], rtol=1e-5, atol=1e-3)


def test_stride8_grid_contract():
    """grid_stride=8: one patchify stem, every trunk tensor at <= in/8,
    the SAME head contract — 64^2-equivalent maps emitted by channel-to-
    space, coords in [0,1], angle head intact (VERDICT r3 #4)."""
    cfg = fixtures.shrink_tpu_native(default_demo_config(), grid_stride=8)
    k = cfg["heatmapModel"]["num_joints"]
    for head, check in (
        ("coordinates", lambda o: (o[0].shape == (2, k, 16, 16)
                                   and o[1].shape == (2, k, 2))),
        ("heatmap", lambda o: o.shape == (2, k, 16, 16)),
        ("angleregression", lambda o: o.shape == (2, 2)),
    ):
        cfg["heatmapModel"]["head_type"] = head
        model = build_heatmap_model(cfg)
        assert model.grid_stride == 8
        v = _init(model)
        # the stem is a single 8x8 patchify conv; no 3x3 stem convs exist
        assert "stem.patch" in v["params"]
        assert "stem.conv1" not in v["params"]
        out = model.apply(v, jnp.zeros((2, 64, 64, 3)), train=False)
        assert check(out), head
        out2, st = model.apply(v, jnp.ones((2, 64, 64, 3)) * 0.3,
                               train=True, mutable=["batch_stats"])
        assert "batch_stats" in st
        assert check(out2), f"{head} (train)"
    # coordinates bounded
    cfg["heatmapModel"]["head_type"] = "coordinates"
    model = build_heatmap_model(cfg)
    v = _init(model)
    rng = np.random.RandomState(0)
    maps, coords = model.apply(
        v, jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32)),
        train=False)
    coords = np.asarray(coords)
    assert np.all(np.isfinite(np.asarray(maps)))
    assert np.all((coords >= 0) & (coords <= 1))


def test_stride8_trains_and_runs_fused_pipeline(kitti_root):
    """The stride-8 family is a drop-in: IGRTrainer steps decrease the
    loss and the fused EgoNet program produces finite angles."""
    from egonet_tpu.train.igrs import IGRTrainer
    from egonet_tpu.data.loader import IGRBatchLoader
    from egonet_tpu.models.egonet import EgoNet
    root, _ = kitti_root
    cfg = _train_cfg(root)
    cfg["heatmapModel"]["extra"]["grid_stride"] = 8
    ds = kitti.KITTIDataset(cfg, "train")
    trainer = IGRTrainer(cfg)
    loader = IGRBatchLoader(ds.records, cfg, train=True)
    batch = next(loader.epoch())
    state = trainer.init_state(0)
    losses = []
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch, apply_cr=False)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], losses

    icfg = fixtures.shrink_tpu_native(default_demo_config(), grid_stride=8)
    icfg["dataset"]["root"] = root
    model = EgoNet(icfg, pre_trained=False)
    dsv = kitti.get_dataset(icfg, split="valid")
    name = dsv.image_names[0]
    rec = dsv.annot_dict[name]
    annot = {"path": [dsv.paths.image_path(name)], "boxes": [rec["bbox_2d"]],
             "K": [rec["K"]], "raw_txt_format": [rec["raw_txt_format"]]}
    out = model(annot)[dsv.paths.image_path(name)]
    assert np.all(np.isfinite(out["euler_angles"]))
    assert np.all(np.abs(out["alphas"]) <= np.pi + 1e-6)


def test_stride8_torch_interchange_roundtrip():
    """HC.pth interchange holds for the stride-8 family (the gate saves
    and reloads its trained checkpoint through torch format)."""
    import tempfile
    from egonet_tpu.io import checkpoint, torch_convert
    cfg = fixtures.shrink_tpu_native(default_demo_config(), grid_stride=8)
    model = build_heatmap_model(cfg)
    v = numpy_init(model, 3, jnp.zeros((1, 64, 64, 3)))
    variables = {"params": jax.device_get(v["params"]),
                 "batch_stats": jax.device_get(v.get("batch_stats", {}))}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "HC.pth")
        checkpoint.save_torch_state_dict(path, variables)
        sd = torch_convert.load_torch_state_dict(path)
        back = torch_convert.torch_to_flax(sd)
    problems = torch_convert.check_conversion(
        jax.tree_util.tree_map(np.asarray, dict(v)), back)
    assert not problems, problems[:5]
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 64, 64, 3).astype(np.float32))
    a_maps, a_coords = model.apply(v, x, train=False)
    b_maps, b_coords = model.apply(back, x, train=False)
    np.testing.assert_allclose(np.asarray(a_coords), np.asarray(b_coords),
                               atol=1e-6)


def test_per_stage_expansion_widths():
    """expansion accepts an int (uniform) or a per-stage tuple; the hidden
    (pw1) widths must follow width[s] * expansion[s], head blocks keep the
    last stage's ratio (models/tpu_native.py:_expansion_for)."""
    def pw1_widths(expansion):
        cfg = default_demo_config()
        hm = cfg["heatmapModel"]
        hm["name"] = "tpu_native"
        hm["pretrained"] = ""
        hm["extra"] = {"depths": [1, 1, 1], "widths": [8, 16, 32],
                       "expansion": expansion, "head_width": 8}
        hm["input_size"] = [64, 64]
        hm["heatmap_size"] = [16, 16]
        model = build_heatmap_model(cfg)
        params = _init(model)["params"]
        return {name: params[f"{name}.pw1"]["kernel"].shape[-1]
                for name in ("stage0.0", "stage1.0", "stage2.0", "head2.0")}

    per_stage = pw1_widths([2, 3, 4])
    assert per_stage["stage0.0"] == 8 * 2
    assert per_stage["stage1.0"] == 16 * 3
    assert per_stage["stage2.0"] == 32 * 4
    assert per_stage["head2.0"] == 8 * 4          # head = last stage's ratio

    uniform = pw1_widths(3)
    assert uniform["stage0.0"] == 8 * 3
    assert uniform["stage1.0"] == 16 * 3
    assert uniform["stage2.0"] == 32 * 3
    assert uniform["head2.0"] == 8 * 3
