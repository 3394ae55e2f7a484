"""Model construction, forward shapes, and torch checkpoint conversion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egonet_tpu.config import default_demo_config
from egonet_tpu.models.hrnet import build_hrnet
from egonet_tpu.models.fc_lifter import build_fc_model
from egonet_tpu.io import torch_convert as tc


@pytest.fixture(scope="module")
def demo_cfg():
    return default_demo_config()


@pytest.fixture(scope="module")
def hrnet_small_cfg(demo_cfg):
    """A scaled-down HRNet (same topology, tiny channels) for fast tests."""
    import copy
    from tests import fixtures
    return fixtures.shrink_hrnet(copy.deepcopy(demo_cfg),
                                 num_modules=(1, 2, 1))


def test_hrnet_coordinates_forward(hrnet_small_cfg):
    model = build_hrnet(hrnet_small_cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    maps, coords = model.apply(variables, x)
    assert maps.shape == (2, 33, 16, 16)
    assert coords.shape == (2, 33, 2)
    assert float(coords.min()) >= 0.0 and float(coords.max()) <= 1.0


def test_hrnet_torch_roundtrip(hrnet_small_cfg):
    """flax -> torch-naming -> flax round trip preserves every tensor."""
    model = build_hrnet(hrnet_small_cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.tree_util.tree_map(
        np.asarray, dict(model.init(jax.random.PRNGKey(1), x)))
    torch_sd = tc.flax_to_torch(variables)
    # keys look like real HRNet state_dict keys
    assert "conv1.weight" in torch_sd
    assert "layer1.0.conv1.weight" in torch_sd
    assert "stage2.0.branches.0.0.conv1.weight" in torch_sd
    assert "stage2.0.fuse_layers.0.1.0.weight" in torch_sd
    assert "transition1.1.0.0.weight" in torch_sd
    assert "head1.0.weight" in torch_sd and "head1.0.bias" in torch_sd
    assert "head2.0.downsample.0.weight" in torch_sd
    assert "bn1.running_mean" in torch_sd

    back = tc.torch_to_flax(torch_sd)
    problems = tc.check_conversion(variables, back)
    assert problems == [], problems
    # numerically identical outputs
    out1 = model.apply(variables, x)
    out2 = model.apply(back, x)
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]),
                               atol=1e-6)


def test_fc_lifter_forward_and_roundtrip(demo_cfg):
    model = build_fc_model(demo_cfg)
    x = jnp.zeros((4, 66))
    variables = jax.tree_util.tree_map(
        np.asarray, dict(model.init(jax.random.PRNGKey(0), x)))
    out = model.apply(variables, x)
    assert out.shape == (4, 96)

    torch_sd = tc.flax_to_torch(variables)
    assert "w1.weight" in torch_sd
    assert "res_blocks.0.batch_norm1.running_mean" in torch_sd
    assert "res_blocks.1.w2.weight" in torch_sd
    back = tc.torch_to_flax(torch_sd)
    assert tc.check_conversion(variables, back) == []


def test_conv_bn_matches_torch(rng):
    """Numeric parity of the conv+bn building block vs torch (eval mode)."""
    import torch
    import torch.nn as tnn
    import flax.linen as nn

    x = rng.randn(2, 3, 16, 16).astype(np.float32)  # NCHW for torch
    conv = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    bn = tnn.BatchNorm2d(8, momentum=0.1)
    bn.running_mean.data = torch.from_numpy(rng.randn(8).astype(np.float32))
    bn.running_var.data = torch.from_numpy(
        rng.uniform(0.5, 2.0, 8).astype(np.float32))
    bn.weight.data = torch.from_numpy(rng.randn(8).astype(np.float32))
    bn.bias.data = torch.from_numpy(rng.randn(8).astype(np.float32))
    conv.eval(), bn.eval()
    with torch.no_grad():
        ref = bn(conv(torch.from_numpy(x))).numpy()

    sd = {**{f"c.{k}": v for k, v in conv.state_dict().items()},
          **{f"b.{k}": v for k, v in bn.state_dict().items()}}
    variables = tc.torch_to_flax(sd)

    class M(nn.Module):
        @nn.compact
        def __call__(self, y):
            y = nn.Conv(8, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        use_bias=False, name="c")(y)
            return nn.BatchNorm(use_running_average=True, momentum=0.9,
                                epsilon=1e-5, name="b")(y)

    out = M().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_hrnet_fuse_merge_parity(hrnet_small_cfg):
    """fuse_merge is a pure program-shape flag: identical parameter tree
    (same names, shapes, init values) and matching outputs in eval AND
    train mode (incl. batch-stats updates) with shared parameters."""
    import copy
    merged_cfg = copy.deepcopy(hrnet_small_cfg)
    merged_cfg["heatmapModel"]["fuse_merge"] = True
    m0 = build_hrnet(hrnet_small_cfg)
    m1 = build_hrnet(merged_cfg)
    assert not m0.fuse_merge and m1.fuse_merge

    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    v0 = m0.init(jax.random.PRNGKey(0), x)
    v1 = m1.init(jax.random.PRNGKey(0), x)
    p0 = jax.tree_util.tree_leaves_with_path(dict(v0))
    p1 = jax.tree_util.tree_leaves_with_path(dict(v1))
    assert [k for k, _ in p0] == [k for k, _ in p1]
    for (k, a), (_, b) in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))

    maps0, c0 = m0.apply(v0, x)
    maps1, c1 = m1.apply(v0, x)          # merged program, SAME params
    np.testing.assert_allclose(np.asarray(maps0), np.asarray(maps1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-5)

    (o0, _), s0 = m0.apply(v0, x, train=True, mutable=["batch_stats"])
    (o1, _), s1 = m1.apply(v0, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s0),
                    jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_full_hrnet_w48_param_count(demo_cfg):
    """The full W48 'coordinates' model initializes with a plausible size."""
    model = build_hrnet(demo_cfg)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 256, 256, 3))),
        jax.random.PRNGKey(0))
    n_params = sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(variables["params"]))
    # HRNet-W48 backbone + coordinate head: ~64M params
    assert 6e7 < n_params < 7e7, n_params
