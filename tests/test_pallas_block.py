"""Pallas fused BasicBlock vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from egonet_tpu.ops import pallas_block as pb


def _random_block(rng, C):
    w1 = rng.randn(3, 3, C, C).astype(np.float32) * 0.1
    w2 = rng.randn(3, 3, C, C).astype(np.float32) * 0.1
    def bn():
        return {"scale": rng.uniform(0.5, 1.5, C).astype(np.float32),
                "bias": rng.randn(C).astype(np.float32) * 0.1,
                "mean": rng.randn(C).astype(np.float32) * 0.1,
                "var": rng.uniform(0.5, 2.0, C).astype(np.float32)}
    return w1, bn(), w2, bn()


def test_fold_bn_matches_unfused(rng):
    C = 8
    w1, bn1, w2, bn2 = _random_block(rng, C)
    x = rng.randn(2, 8, 8, C).astype(np.float32)
    ref = pb.reference_basic_block(jnp.asarray(x), w1, bn1, w2, bn2)
    # folded conv path computed directly
    w1f, b1 = pb.fold_bn(w1, **bn1)
    w2f, b2 = pb.fold_bn(w2, **bn2)
    def conv(h, w):
        return jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jnp.maximum(conv(jnp.asarray(x), jnp.asarray(w1f)) + b1, 0)
    y = jnp.maximum(conv(y, jnp.asarray(w2f)) + b2 + x, 0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("H,W,C,B,TH,TW", [
    (8, 8, 8, 16, 4, 4),
    (16, 8, 16, 8, 4, 8),
    (8, 16, 8, 8, 8, 4),
])
def test_fused_block_matches_reference(rng, H, W, C, B, TH, TW):
    w1, bn1, w2, bn2 = _random_block(rng, C)
    x = (rng.randn(B, H, W, C) * 0.5).astype(np.float32)

    ref = np.asarray(pb.reference_basic_block(jnp.asarray(x), w1, bn1,
                                              w2, bn2))

    params = pb.pack_block_weights(w1, bn1, w2, bn2)
    xT = jnp.asarray(np.transpose(x, (1, 2, 3, 0)).astype(np.float32))
    yT = pb.fused_basic_block(xT.astype(jnp.bfloat16), params,
                              tile_rows=TH, tile_cols=TW, interpret=True)
    got = np.transpose(np.asarray(yT, dtype=np.float32), (3, 0, 1, 2))
    # bf16 activations: compare loosely but element-wise everywhere
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.05)
    # structural check at f32 would be exact; verify zero-padding borders
    assert np.isfinite(got).all()


@pytest.mark.parametrize("H,W,C,B,TW", [
    (8, 8, 8, 16, 8),
    (16, 16, 8, 8, 8),
])
def test_stencil_block_matches_reference(rng, H, W, C, B, TW):
    from egonet_tpu.ops import pallas_block_stencil as pbs
    w1, bn1, w2, bn2 = _random_block(rng, C)
    x = (rng.randn(B, H, W, C) * 0.5).astype(np.float32)
    ref = np.asarray(pb.reference_basic_block(jnp.asarray(x), w1, bn1,
                                              w2, bn2))
    params = pbs.pack_stencil_weights(w1, bn1, w2, bn2)
    xT = jnp.asarray(np.transpose(x, (1, 2, 3, 0))).astype(jnp.bfloat16)
    yT = pbs.fused_basic_block_stencil(xT, params, tile_cols=TW,
                                       interpret=True)
    got = np.transpose(np.asarray(yT, dtype=np.float32), (3, 0, 1, 2))
    np.testing.assert_allclose(got, ref, atol=0.15, rtol=0.05)


def test_stencil_flag_gating(monkeypatch):
    """EGONET_PALLAS_STENCIL: '0' off, '1' forced on, 'auto' probes the
    toolchain (VERDICT r1 task 10 — parked but cheap to revive)."""
    from egonet_tpu.ops import pallas_block_stencil as s
    assert s.stencil_enabled("0") is False
    assert s.stencil_enabled("1") is True
    monkeypatch.setenv("EGONET_PALLAS_STENCIL", "0")
    assert s.stencil_enabled() is False
    # auto consults the (cached) probe and returns a bool either way;
    # derive the cache key from the probe's own defaults so this test
    # keeps testing cache consultation if the defaults change
    import inspect
    key = tuple(p.default
                for p in inspect.signature(s.probe_wide_tile)
                .parameters.values())
    s._PROBE_CACHE[key] = False
    assert s.stencil_enabled("auto") is False
    s._PROBE_CACHE[key] = True
    assert s.stencil_enabled("auto") is True
    s._PROBE_CACHE.clear()


def test_probe_args_shape_compatible():
    """probe_wide_tile's input construction must match the kernel signature
    ([H, W, C, B], W % tile_cols == 0) — a mis-shaped probe can never enable
    the stencil on a capable toolchain (code-review r2 finding).  Verified
    end-to-end in interpret mode at a tiny size."""
    from egonet_tpu.ops import pallas_block_stencil as pbs
    x, params = pbs.probe_args(tile_cols=8, channels=8, width=16,
                               batch=4, height=4)
    y = pbs.fused_basic_block_stencil(x, params, tile_cols=8, interpret=True)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y, np.float32)).all()
