"""High-Resolution Network (HRNet) keypoint model in Flax, NHWC, TPU-first.

Architectural spec being reproduced (for checkpoint compatibility):
/root/reference/libs/model/heatmapModel/hrnet.py — stem (:318-325), Bottleneck
layer1, three transition layers, stages 2/3/4 of multi-resolution modules with
sum-fusion (:136-300), and three heads (:362-469): 'heatmap' (+ optional
pixel-shuffle upsample), 'coordinates' (the one EgoNet ships: 1x1 conv to K
maps, 2 fixed coordinate channels, 4 stride-2 basic blocks, valid conv,
sigmoid -> [N, K, 2] normalized coords) and 'angleregression'.

Module names are chosen to equal the PyTorch ``state_dict`` key prefixes
(e.g. ``stage2.0.branches.1.3.conv2``) so converted checkpoints map 1:1 —
see egonet_tpu/io/torch_convert.py.

TPU-first choices: NHWC layout, optional bf16 compute with fp32 parameters
and fp32 batch-norm statistics, nearest-neighbour upsampling as an exact
integer repeat (fusable by XLA), and a fully static module graph (all Python
control flow here is config-driven, traced once under jit).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

BN_MOMENTUM_TORCH = 0.1  # flax momentum = 1 - torch momentum


class StageCfg:
    """Static per-stage configuration (hashable tuple wrapper)."""

    def __init__(self, num_modules, num_branches, block, num_blocks,
                 num_channels, fuse_method="sum"):
        self.num_modules = int(num_modules)
        self.num_branches = int(num_branches)
        self.block = str(block)
        self.num_blocks = tuple(int(b) for b in num_blocks)
        self.num_channels = tuple(int(c) for c in num_channels)
        self.fuse_method = str(fuse_method)

    @classmethod
    def from_dict(cls, d):
        return cls(d["num_modules"], d["num_branches"], d["block"],
                   d["num_blocks"], d["num_channels"],
                   d.get("fuse_method", "sum"))

    @property
    def widths(self):
        """Branch output widths: num_channels scaled by the block
        expansion (reference hrnet.py:326-355 multiplies the stage channel
        list by block.expansion before building transitions/fuses; basic=1,
        bottleneck=4)."""
        exp = 4 if self.block == "bottleneck" else 1
        return tuple(c * exp for c in self.num_channels)

    def _key(self):
        return (self.num_modules, self.num_branches, self.block,
                self.num_blocks, self.num_channels, self.fuse_method)

    def __eq__(self, other):
        return isinstance(other, StageCfg) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())


def _upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """Exact integer nearest-neighbour upsample (torch nn.Upsample parity).

    Two sequential jnp.repeat calls on purpose: a fused
    broadcast_to+reshape variant was measured 4.5x SLOWER end-to-end on
    v5e (the single reshape forces a full tiled-layout relayout copy,
    while per-axis repeats lower to layout-preserving broadcasts)."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class _ConvKernel(nn.Module):
    """Declares an ``nn.Conv``-compatible kernel parameter (same name,
    shape, param dtype and initializer) WITHOUT running the convolution,
    so several same-geometry convs reading one tensor can be computed in a
    single merged pass (see ``PoseHighResolutionNet.fuse_merge``).  The
    parameter tree is identical to the unmerged model's, so checkpoints
    and the torch converter are unaffected."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


def _pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC pixel shuffle matching torch nn.PixelShuffle channel ordering."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)           # channel index = c*r*r + dy*r + dx
    x = x.transpose(0, 1, 4, 2, 5, 3)         # [n, h, dy, w, dx, c]
    return x.reshape(n, h * r, w * r, c)


class PoseHighResolutionNet(nn.Module):
    """HRNet-W48/W32 with the EgoNet heads."""

    stage2: StageCfg
    stage3: StageCfg
    stage4: StageCfg
    num_joints: int = 33
    head_type: str = "coordinates"
    heatmap_size: tuple = (64, 64)      # (width, height) — config order
    input_size: tuple = (256, 256)      # (width, height)
    pixel_shuffle: bool = False
    final_conv_kernel: int = 1
    in_channels: int = 3
    dtype: Any = jnp.float32
    # activation transport between conv fusions: "none" | "int8".
    # The W48 inference program is HBM-bandwidth-bound (branch activations
    # at 64x64/32x32 move ~20 GB/batch); storing inter-block tensors as
    # uint8 halves that traffic.  Post-ReLU activations are non-negative,
    # so an asymmetric [0, act_quant_scale] -> [0, 255] code is used.
    act_quant: str = "none"
    act_quant_scale: float = 8.0
    # merge same-geometry sibling convs that read one tensor (the first
    # stride-2 conv of every fuse-layer downsample chain, the fuse-layer
    # 1x1 up-convs, and layer1 block-0's conv1/downsample pair) into one
    # wider conv + split: one pass over the big branch activations instead
    # of one per destination, and a fuller MXU output-column dimension.
    # Same math per output channel (the contraction axes are unchanged)
    # and the SAME parameter tree — a pure program-shape flag.
    fuse_merge: bool = False

    # ---------------- primitive layers ----------------

    @property
    def _precision(self):
        # fp32/fp64 runs want true full-precision math (the platform default
        # is bf16); bf16 runs use the native MXU path.
        return (jax.lax.Precision.DEFAULT
                if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST)

    @property
    def _stat_dtype(self):
        # BN statistics / head outputs: fp32 for fp32+bf16 compute, fp64
        # when the model itself runs in fp64 (exact training differentials)
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
        # BN statistics and affine run in fp32 regardless of compute dtype.
        # use_fast_variance=False: the one-pass E[x^2]-E[x]^2 batch variance
        # cancels catastrophically on post-ReLU activations (mean >> std),
        # costing ~3 digits of GRADIENT accuracy per train-mode BN layer
        # (measured: 2e-3 relative input-grad error vs 5e-7 two-pass);
        # compounded over the stack it moved full-model gradients by ~5%.
        # Two-pass variance matches torch's train-mode numerics and only
        # runs when batch statistics are computed (never in inference).
        y = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - BN_MOMENTUM_TORCH,
                         epsilon=1e-5, dtype=self._stat_dtype,
                         param_dtype=jnp.float32, use_fast_variance=False,
                         name=name)(x)
        return y.astype(self.dtype)

    def _transport(self, x):
        """Quantize-dequantize a post-ReLU tensor crossing a fusion boundary
        (uint8 storage when act_quant='int8'; identity otherwise)."""
        if self.act_quant != "int8":
            return x
        inv_step = 255.0 / self.act_quant_scale
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_step),
                     0.0, 255.0).astype(jnp.uint8)
        # the barrier pins the UINT8 tensor as the materialized fusion
        # output (otherwise XLA fuses the dequant back into the producer
        # and the boundary tensor stays bf16 — no bandwidth saved)
        q = jax.lax.optimization_barrier(q)
        return (q.astype(self.dtype)
                * jnp.asarray(1.0 / inv_step, self.dtype))

    def _merged_convs(self, x, k, stride, specs):
        """One conv pass computing several same-geometry convs (equal
        kernel size / stride / input, different weights).  ``specs`` is a
        list of (nn.Conv-compatible module name, out_channels); kernels
        are declared under those names (identical parameter tree to
        separate ``nn.Conv`` calls), concatenated along the output-channel
        axis, applied once, and split back."""
        in_ch = x.shape[-1]
        kers = [_ConvKernel((k, k, in_ch, out_ch), name=name)()
                for name, out_ch in specs]
        merged = jnp.concatenate([w.astype(self.dtype) for w in kers],
                                 axis=-1)
        pad = (k - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), merged, (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self._precision)
        outs, ofs = [], 0
        for _, out_ch in specs:
            outs.append(y[..., ofs:ofs + out_ch])
            ofs += out_ch
        return outs

    # ---------------- blocks ----------------

    def _basic_block(self, x, planes, stride, prefix, train,
                     force_downsample=False):
        in_ch = x.shape[-1]
        residual = x
        y = self._conv(x, planes, 3, stride, f"{prefix}.conv1")
        y = self._bn(y, f"{prefix}.bn1", train)
        y = nn.relu(y)
        y = self._conv(y, planes, 3, 1, f"{prefix}.conv2")
        y = self._bn(y, f"{prefix}.bn2", train)
        if stride != 1 or in_ch != planes or force_downsample:
            residual = self._conv(x, planes, 1, stride,
                                  f"{prefix}.downsample.0", padding=0)
            residual = self._bn(residual, f"{prefix}.downsample.1", train)
        return self._transport(nn.relu(y + residual))

    def _bottleneck(self, x, planes, stride, prefix, train):
        expansion = 4
        in_ch = x.shape[-1]
        need_ds = stride != 1 or in_ch != planes * expansion
        if self.fuse_merge and need_ds and stride == 1:
            # conv1 and downsample.0 are both 1x1 stride-1 reads of x:
            # compute them in one pass (fuse_merge)
            y, residual = self._merged_convs(
                x, 1, 1, [(f"{prefix}.conv1", planes),
                          (f"{prefix}.downsample.0", planes * expansion)])
        else:
            y = self._conv(x, planes, 1, 1, f"{prefix}.conv1", padding=0)
            residual = (self._conv(x, planes * expansion, 1, stride,
                                   f"{prefix}.downsample.0", padding=0)
                        if need_ds else x)
        y = self._bn(y, f"{prefix}.bn1", train)
        y = nn.relu(y)
        y = self._conv(y, planes, 3, stride, f"{prefix}.conv2")
        y = self._bn(y, f"{prefix}.bn2", train)
        y = nn.relu(y)
        y = self._conv(y, planes * expansion, 1, 1, f"{prefix}.conv3", padding=0)
        y = self._bn(y, f"{prefix}.bn3", train)
        if need_ds:
            residual = self._bn(residual, f"{prefix}.downsample.1", train)
        return self._transport(nn.relu(y + residual))

    def _block(self, kind):
        return self._basic_block if kind == "basic" else self._bottleneck

    # ---------------- transitions and stages ----------------

    def _transition(self, x_list, cur_channels, prefix, train):
        """Adapt previous-stage branches to the next stage's channel list.

        Matching the reference forward semantics: every non-identity
        transition consumes the LAST branch of the previous stage.
        """
        num_pre = len(x_list)
        outs = []
        for i, ch in enumerate(cur_channels):
            if i < num_pre:
                if x_list[i].shape[-1] != ch:
                    y = self._conv(x_list[-1], ch, 3, 1, f"{prefix}.{i}.0")
                    y = self._bn(y, f"{prefix}.{i}.1", train)
                    outs.append(self._transport(nn.relu(y)))
                else:
                    outs.append(x_list[i])
            else:
                y = x_list[-1]
                for j in range(i + 1 - num_pre):
                    out_ch = ch if j == i - num_pre else y.shape[-1]
                    y = self._conv(y, out_ch, 3, 2, f"{prefix}.{i}.{j}.0")
                    y = self._bn(y, f"{prefix}.{i}.{j}.1", train)
                    y = nn.relu(y)
                outs.append(y)
        return outs

    def _hr_module(self, x_list, cfg: StageCfg, prefix, train,
                   multi_scale_output=True):
        nb = cfg.num_branches
        block = self._block(cfg.block)
        # branches
        ys = []
        for i in range(nb):
            y = x_list[i]
            for b in range(cfg.num_blocks[i]):
                y = block(y, cfg.num_channels[i], 1,
                          f"{prefix}.branches.{i}.{b}", train)
            ys.append(y)
        if nb == 1:
            return ys
        # fuse
        out_count = nb if multi_scale_output else 1
        d0, u0 = {}, {}
        if self.fuse_merge:
            # fuse_merge: group the convs that read ys[j] — the FIRST
            # stride-2 conv of every downsample chain out of branch j and
            # the 1x1 up-convs out of branch j — into one pass per group
            for j in range(nb):
                down = list(range(j + 1, out_count))
                if down:
                    outs = self._merged_convs(
                        ys[j], 3, 2,
                        [(f"{prefix}.fuse_layers.{i}.{j}.0.0",
                          ys[i].shape[-1] if i == j + 1 else ys[j].shape[-1])
                         for i in down])
                    for i, t in zip(down, outs):
                        t = self._bn(t, f"{prefix}.fuse_layers.{i}.{j}.0.1",
                                     train)
                        d0[(i, j)] = t if i == j + 1 else nn.relu(t)
                up = list(range(min(j, out_count)))
                if up:
                    outs = self._merged_convs(
                        ys[j], 1, 1,
                        [(f"{prefix}.fuse_layers.{i}.{j}.0",
                          ys[i].shape[-1]) for i in up])
                    for i, t in zip(up, outs):
                        u0[(i, j)] = self._bn(
                            t, f"{prefix}.fuse_layers.{i}.{j}.1", train)
        fused = []
        for i in range(out_count):
            acc = None
            for j in range(i + 1):
                if j == i:
                    t = ys[j]
                else:
                    t = d0[(i, j)] if self.fuse_merge else ys[j]
                    for k in range(1 if self.fuse_merge else 0, i - j):
                        last = (k == i - j - 1)
                        out_ch = ys[i].shape[-1] if last else ys[j].shape[-1]
                        t = self._conv(t, out_ch, 3, 2,
                                       f"{prefix}.fuse_layers.{i}.{j}.{k}.0")
                        t = self._bn(t, f"{prefix}.fuse_layers.{i}.{j}.{k}.1",
                                     train)
                        if not last:
                            t = nn.relu(t)
                acc = t if acc is None else acc + t
            # lower-resolution contributions, nested coarse-to-fine: since
            # nearest-neighbor up4 = up2(up2(.)) and upsampling is linear,
            # summing at the coarse level first materializes one full-res
            # tensor instead of one per branch (exact same result)
            up_acc = None
            for j in range(nb - 1, i, -1):
                if self.fuse_merge:
                    t = u0[(i, j)]
                else:
                    t = self._conv(ys[j], ys[i].shape[-1], 1, 1,
                                   f"{prefix}.fuse_layers.{i}.{j}.0",
                                   padding=0)
                    t = self._bn(t, f"{prefix}.fuse_layers.{i}.{j}.1", train)
                up_acc = t if up_acc is None else _upsample_nearest(up_acc,
                                                                   2) + t
            if up_acc is not None:
                acc = acc + _upsample_nearest(up_acc, 2)
            fused.append(self._transport(nn.relu(acc)))
        return fused

    def _stage(self, x_list, cfg: StageCfg, prefix, train,
               multi_scale_output=True):
        for m in range(cfg.num_modules):
            mso = multi_scale_output or (m < cfg.num_modules - 1)
            x_list = self._hr_module(x_list, cfg, f"{prefix}.{m}", train,
                                     multi_scale_output=mso)
        return x_list

    # ---------------- heads ----------------

    def _coordinates_head(self, y0, train):
        k = self.num_joints
        map_w, map_h = int(self.heatmap_size[0]), int(self.heatmap_size[1])
        maps = self._conv(y0, k, 1, 1, "head1.0", padding=0, use_bias=True)
        # fixed normalized coordinate channels (coordinate convolution)
        xs = np.tile(np.linspace(0, 1, map_w, dtype=np.float32), (map_h, 1))
        ysc = np.tile(np.linspace(0, 1, map_h, dtype=np.float32)[:, None],
                      (1, map_w))
        coor = jnp.asarray(np.stack([xs, ysc], axis=-1))          # [H, W, 2]
        coor = jnp.broadcast_to(coor, (maps.shape[0],) + coor.shape)
        h = jnp.concatenate([maps, coor.astype(maps.dtype)], axis=-1)
        for b in range(4):
            h = self._basic_block(h, 2 * k, 2, f"head2.{b}", train,
                                  force_downsample=True)
        ks = (map_h // 16, map_w // 16)
        h = nn.Conv(2 * k, ks, padding="VALID", use_bias=True,
                    dtype=self.dtype, precision=self._precision,
                    param_dtype=jnp.float32, name="head2.4")(h)
        coords = nn.sigmoid(h.astype(self._stat_dtype))
        coords = coords.reshape(coords.shape[0], -1, 2)           # [N, K, 2]
        # maps stay NHWC internally; expose NCHW to mirror the torch contract
        return maps.astype(self._stat_dtype).transpose(0, 3, 1, 2), coords

    def _heatmap_head(self, y0, train):
        k = self.num_joints
        fk = self.final_conv_kernel
        x = self._conv(y0, k, fk, 1, "final_layer",
                       padding=1 if fk == 3 else 0, use_bias=True)
        if self.pixel_shuffle:
            r = int(self.heatmap_size[0] / self.input_size[0] * 4)
            x = nn.Conv(k * r * r, (1, 1), use_bias=True, dtype=self.dtype,
                        precision=self._precision,
                        param_dtype=jnp.float32, name="upsample_layer.0")(x)
            x = self._bn(x, "upsample_layer.1", train)
            x = nn.relu(x)
            x = _pixel_shuffle(x, r)
        return x.astype(self._stat_dtype).transpose(0, 3, 1, 2)

    def _angle_head(self, y0, train):
        ch = 256
        h = self._conv(y0, ch, 1, 1, "head.0", padding=0, use_bias=True)
        for b in range(1, 5):
            h = self._basic_block(h, ch, 2, f"head.{b}", train,
                                  force_downsample=True)
        # the reference AvgPool2d(4) assumes the remaining 4x4 map (input
        # 256); global mean is identical there and well-defined elsewhere
        h = jnp.mean(h, axis=(1, 2))
        h = h.reshape(h.shape[0], -1).astype(self._stat_dtype)
        h = nn.Dense(256, dtype=self._stat_dtype,
                     precision=jax.lax.Precision.HIGHEST, name="final_fc.0")(h)
        h = nn.BatchNorm(use_running_average=not train,
                         momentum=1.0 - BN_MOMENTUM_TORCH, epsilon=1e-5,
                         dtype=self._stat_dtype, use_fast_variance=False,
                         name="final_fc.1")(h)
        h = nn.relu(h)
        return nn.Dense(2, dtype=self._stat_dtype,
                        precision=jax.lax.Precision.HIGHEST,
                        name="final_fc.3")(h)

    # ---------------- forward ----------------

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [N, H, W, C] normalized crops.  Returns per head:
        'coordinates' -> (maps [N, K, Hh, Wh], coords [N, K, 2]);
        'heatmap' -> [N, K, Hh, Wh]; 'angleregression' -> [N, 2].
        """
        x = x.astype(self.dtype)
        x = self._conv(x, 64, 3, 2, "conv1")
        x = self._bn(x, "bn1", train)
        x = nn.relu(x)
        x = self._conv(x, 64, 3, 2, "conv2")
        x = self._bn(x, "bn2", train)
        x = nn.relu(x)
        for b in range(4):
            x = self._bottleneck(x, 64, 1, f"layer1.{b}", train)

        # transitions target the EXPANSION-SCALED widths (reference scales
        # num_channels by block.expansion; identical for 'basic' blocks)
        xs = self._transition([x], self.stage2.widths, "transition1",
                              train)
        ys = self._stage(xs, self.stage2, "stage2", train)
        xs = self._transition(ys, self.stage3.widths, "transition2",
                              train)
        ys = self._stage(xs, self.stage3, "stage3", train)
        xs = self._transition(ys, self.stage4.widths, "transition3",
                              train)
        ys = self._stage(xs, self.stage4, "stage4", train,
                         multi_scale_output=False)

        if self.head_type == "coordinates":
            return self._coordinates_head(ys[0], train)
        if self.head_type == "heatmap":
            return self._heatmap_head(ys[0], train)
        if self.head_type == "angleregression":
            return self._angle_head(ys[0], train)
        raise NotImplementedError(self.head_type)


def build_hrnet(cfgs: dict, dtype=jnp.float32) -> PoseHighResolutionNet:
    """Construct from a reference-style config dict (cfgs['heatmapModel'])."""
    hm = cfgs["heatmapModel"]
    extra = hm["extra"]
    in_ch = 5 if hm.get("add_xy", False) else 3
    return PoseHighResolutionNet(
        stage2=StageCfg.from_dict(extra["stage2"]),
        stage3=StageCfg.from_dict(extra["stage3"]),
        stage4=StageCfg.from_dict(extra["stage4"]),
        num_joints=int(hm["num_joints"]),
        head_type=hm.get("head_type", "coordinates"),
        heatmap_size=tuple(hm.get("heatmap_size", (64, 64))),
        input_size=tuple(hm.get("input_size", (256, 256))),
        pixel_shuffle=bool(hm.get("pixel_shuffle", False)),
        final_conv_kernel=int(extra.get("final_conv_kernel", 1)),
        in_channels=in_ch,
        dtype=dtype,
        act_quant=str(hm.get("act_quant", "none")),
        act_quant_scale=float(hm.get("act_quant_scale", 8.0)),
        fuse_merge=bool(hm.get("fuse_merge", False)),
    )
