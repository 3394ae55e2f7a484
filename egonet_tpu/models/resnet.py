"""Simple-Baselines pose network: ResNet backbone + deconvolution head.

Alternative heatmap backbone (spec:
/root/reference/libs/model/heatmapModel/resnet.py — ResNet-{18,34,50,101,152}
stem/stages, 3 transposed-conv upsampling layers, final 1x1/3x3 conv).  The
reference registers it but ships no config for it; provided here for feature
parity with the same torch-prefix module naming so Simple-Baselines
checkpoints convert directly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class PoseResNet(nn.Module):
    num_layers: int = 50
    num_joints: int = 33
    num_deconv_layers: int = 3
    num_deconv_filters: tuple = (256, 256, 256)
    num_deconv_kernels: tuple = (4, 4, 4)
    final_conv_kernel: int = 1
    deconv_with_bias: bool = False
    dtype: Any = jnp.float32

    @property
    def _precision(self):
        # fp32 runs want true fp32 math (the platform default is bf16) —
        # same convention as hrnet._precision / fc_lifter
        return (jax.lax.Precision.DEFAULT
                if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST)

    @property
    def _stat_dtype(self):
        return jnp.promote_types(jnp.float32, self.dtype)

    def _conv(self, x, out_ch, k, stride, name, padding=None, use_bias=False):
        if padding is None:
            padding = (k - 1) // 2
        return nn.Conv(out_ch, (k, k), strides=(stride, stride),
                       padding=[(padding, padding), (padding, padding)],
                       use_bias=use_bias, dtype=self.dtype,
                       precision=self._precision,
                       param_dtype=jnp.float32, name=name)(x)

    def _bn(self, x, name, train):
        # two-pass batch variance: see models/hrnet.py _bn — the fast
        # one-pass variance loses ~3 digits of train-mode gradient accuracy
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self._stat_dtype,
                         param_dtype=jnp.float32, use_fast_variance=False,
                         name=name)(x)
        return y.astype(self.dtype)

    def _basic(self, x, planes, stride, prefix, train):
        residual = x
        y = self._conv(x, planes, 3, stride, f"{prefix}.conv1")
        y = self._bn(y, f"{prefix}.bn1", train)
        y = nn.relu(y)
        y = self._conv(y, planes, 3, 1, f"{prefix}.conv2")
        y = self._bn(y, f"{prefix}.bn2", train)
        if stride != 1 or x.shape[-1] != planes:
            residual = self._conv(x, planes, 1, stride,
                                  f"{prefix}.downsample.0", padding=0)
            residual = self._bn(residual, f"{prefix}.downsample.1", train)
        return nn.relu(y + residual)

    def _bottleneck(self, x, planes, stride, prefix, train):
        residual = x
        y = self._conv(x, planes, 1, 1, f"{prefix}.conv1", padding=0)
        y = self._bn(y, f"{prefix}.bn1", train)
        y = nn.relu(y)
        y = self._conv(y, planes, 3, stride, f"{prefix}.conv2")
        y = self._bn(y, f"{prefix}.bn2", train)
        y = nn.relu(y)
        y = self._conv(y, planes * 4, 1, 1, f"{prefix}.conv3", padding=0)
        y = self._bn(y, f"{prefix}.bn3", train)
        if stride != 1 or x.shape[-1] != planes * 4:
            residual = self._conv(x, planes * 4, 1, stride,
                                  f"{prefix}.downsample.0", padding=0)
            residual = self._bn(residual, f"{prefix}.downsample.1", train)
        return nn.relu(y + residual)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, layers = RESNET_SPEC[self.num_layers]
        block = self._basic if block_kind == "basic" else self._bottleneck

        x = x.astype(self.dtype)
        x = self._conv(x, 64, 7, 2, "conv1")
        x = self._bn(x, "bn1", train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers), start=1):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                x = block(x, planes, stride if b == 0 else 1,
                          f"layer{stage}.{b}", train)

        # deconvolution head: ConvTranspose + BN + ReLU.  transpose_kernel
        # gives torch ConvTranspose2d semantics (kernel [kH,kW,out,in] +
        # spatial flip), so the [in,out,kH,kW]->(2,3,1,0) checkpoint
        # conversion rule applies unchanged; paddings verified numerically
        # against torch for the reference _get_deconv_cfg triples
        # (k=4/p=1, k=3/p=1/op=1, k=2/p=0 — resnet.py:152-163).
        for i in range(self.num_deconv_layers):
            k = self.num_deconv_kernels[i]
            x = nn.ConvTranspose(
                self.num_deconv_filters[i], (k, k), strides=(2, 2),
                padding="SAME" if k in (4, 2) else [(1, 2), (1, 2)],
                use_bias=self.deconv_with_bias, dtype=self.dtype,
                precision=self._precision,
                param_dtype=jnp.float32, transpose_kernel=True,
                name=f"deconv_layers.{i * 3}")(x)
            x = self._bn(x, f"deconv_layers.{i * 3 + 1}", train)
            x = nn.relu(x)

        fk = self.final_conv_kernel
        x = self._conv(x, self.num_joints, fk, 1, "final_layer",
                       padding=1 if fk == 3 else 0, use_bias=True)
        return x.astype(self._stat_dtype).transpose(0, 3, 1, 2)


def build_pose_resnet(cfgs: dict, dtype=jnp.float32) -> PoseResNet:
    hm = cfgs["heatmapModel"]
    extra = hm.get("extra", {})
    return PoseResNet(
        num_layers=int(hm.get("num_layers", 50)),
        num_joints=int(hm.get("num_joints", 33)),
        num_deconv_layers=int(extra.get("num_deconv_layers", 3)),
        num_deconv_filters=tuple(extra.get("num_deconv_filters",
                                           (256, 256, 256))),
        num_deconv_kernels=tuple(extra.get("num_deconv_kernels", (4, 4, 4))),
        final_conv_kernel=int(extra.get("final_conv_kernel", 1)),
        deconv_with_bias=bool(extra.get("deconv_with_bias", False)),
        dtype=dtype,
    )
