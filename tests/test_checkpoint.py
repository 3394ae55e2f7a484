"""Checkpoint/resume coverage: msgpack roundtrip, torch interchange in both
directions, partial warm-start merging, and the training resume path
(SURVEY.md §5 checkpoint/resume; reference save points
tools/train_IGRs.py:103-105, layer-filtered load hrnet.py:634-647)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egonet_tpu.io import checkpoint, torch_convert


def _tree_equal(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


@pytest.fixture
def lifter_variables(rng):
    from egonet_tpu.models.fc_lifter import FCModel
    from egonet_tpu.models.initialization import numpy_init
    m = FCModel(input_size=66, output_size=96, num_neurons=64, num_blocks=1)
    return m, numpy_init(m, 0, jnp.zeros((1, 66)))


def test_msgpack_roundtrip(tmp_path, lifter_variables):
    _, variables = lifter_variables
    path = checkpoint.save_variables(str(tmp_path / "L.msgpack"),
                                     dict(variables))
    restored = checkpoint.load_variables(path)
    _tree_equal(jax.tree_util.tree_map(np.asarray, dict(variables)), restored)


def test_torch_interchange_roundtrip(tmp_path, lifter_variables):
    """flax -> .pth -> flax returns identical parameters, and the .pth is
    loadable by plain torch."""
    import torch
    model, variables = lifter_variables
    path = checkpoint.save_torch_state_dict(str(tmp_path / "L.pth"),
                                            dict(variables))
    sd = torch.load(path, weights_only=True)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    back = torch_convert.torch_to_flax(
        torch_convert.load_torch_state_dict(path))
    host = jax.tree_util.tree_map(np.asarray, dict(variables))
    problems = torch_convert.check_conversion(host, back)
    assert problems == []
    _tree_equal(host["params"], back["params"])


def test_merge_partial_warm_start(lifter_variables):
    _, variables = lifter_variables
    base = jax.tree_util.tree_map(np.asarray, dict(variables))
    partial = {"params": {"w1": {"kernel":
               np.full_like(base["params"]["w1"]["kernel"], 7.0)}}}
    merged = checkpoint.merge_partial(base, partial)
    np.testing.assert_array_equal(merged["params"]["w1"]["kernel"], 7.0)
    # untouched keys keep their initialization
    np.testing.assert_array_equal(merged["params"]["w2"]["kernel"],
                                  base["params"]["w2"]["kernel"])
    np.testing.assert_array_equal(merged["params"]["w1"]["bias"],
                                  base["params"]["w1"]["bias"])


def test_lifter_stats_roundtrip(tmp_path):
    stats = {"mean_in": np.random.randn(1, 66).astype(np.float32),
             "std_in": np.ones((1, 66), np.float32),
             "mean_out": np.random.randn(1, 96).astype(np.float32),
             "std_out": np.ones((1, 96), np.float32)}
    path = checkpoint.save_lifter_stats(str(tmp_path / "LS.npy"), stats)
    back = torch_convert.load_lifter_stats(path)
    for k in stats:
        np.testing.assert_allclose(np.asarray(back[k]).reshape(
            stats[k].shape), stats[k], atol=0)


def test_training_resume_from_snapshot(tmp_path, rng):
    """A snapshot written by one trainer warm-starts another: resumed
    parameters equal the saved ones (tools/train_igrs.py resume path)."""
    from tests import fixtures
    from egonet_tpu.config import load_config
    from egonet_tpu.data import kitti
    from egonet_tpu.train.igrs import IGRTrainer
    root, _ = fixtures.make_kitti_root(tmp_path, n_images=2)
    here = os.path.join(os.path.dirname(__file__), "..", "egonet_tpu",
                        "configs")
    cfg = load_config(os.path.join(here, "KITTI_train_IGRs.yml"))
    cfg["dataset"]["root"] = root
    fixtures.shrink_hrnet(cfg)
    cfg["heatmapModel"]["pretrained"] = ""
    cfg["training_settings"].update({"batch_size": 1, "total_epochs": 1})

    ds = kitti.KITTIDataset(cfg, "train")
    trainer = IGRTrainer(cfg)
    from egonet_tpu.data.loader import IGRBatchLoader
    loader = IGRBatchLoader(ds.records, cfg, train=True, max_instances=8)
    state = trainer.init_state(0)
    state, _ = trainer.train_step(state, next(loader.epoch()),
                                  apply_cr=False)
    trainer.save_snapshot(state, str(tmp_path / "HC_epoch1"))

    restored = checkpoint.load_variables(str(tmp_path / "HC_epoch1.msgpack"))
    trainer2 = IGRTrainer(cfg)
    state2 = trainer2.init_state(0, variables=restored)
    _tree_equal(jax.tree_util.tree_map(np.asarray, state.params),
                jax.tree_util.tree_map(np.asarray, state2.params))
    # and the resumed state trains
    state3, metrics = trainer2.train_step(state2, next(loader.epoch()),
                                          apply_cr=False)
    assert np.isfinite(float(metrics["loss"]))
