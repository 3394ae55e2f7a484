"""PoseNetTPU: the TPU-native heatmap/keypoint model family.

This model has NO reference counterpart — it exists because the profiler
said so.  The reference's HRNet-W48 (libs/model/heatmapModel/hrnet.py)
spends 93% of device time in 3x3 convs whose 48/96-channel widths fill
only 48/96 of the MXU's 128 systolic columns (measured fill curve in
docs/performance.md: 48ch = 21% of bf16 peak, 128ch = 48%, 256ch = 71%).
That is a property of the ARCHITECTURE, not a compiler miss, so the fix is
architectural:

* **All heavy FLOPs live in 1x1 convolutions** — pure matmuls with
  contraction/output dims that are multiples of 128 (128->512, 256->1024,
  512->2048).  The MXU runs them at full column occupancy.
* **Spatial mixing is depthwise 3x3** — O(C) work on the VPU, negligible
  FLOPs, no MXU underfill.  This is the inverted-bottleneck (MBConv)
  block: pw-expand -> dw 3x3 -> pw-project, BN+ReLU, residual.
* **Resolution drops fast, and so does expansion where HBM rules**: one
  stride-4 stem (256 -> 64), then stages at 64^2x128 / 32^2x256 /
  16^2x512 with per-stage expansion (2, 3, 4).  The 64^2 stage is
  HBM-bound at any expansion (arithmetic intensity ~80 FLOP/B vs the
  ~240 FLOP/B v5e ridge), so it is shallow (1 block) and lean (2x
  expand); most depth and the full 4x expand sit at 16^2x512 where the
  MXU measures ~75% of peak (profiled depth/expansion sweep in
  docs/performance.md).
* **A pixel-shuffle FPN decoder** returns to stride 4 for the heatmap
  grid: 1x1 lateral matmuls (512->1024, 256->512) + channel-to-space,
  fused top-down with one MBConv blend per level — no transposed convs,
  no nearest-upsample chains of wide tensors.

The module exposes the exact head contract of
models/hrnet.PoseHighResolutionNet ('coordinates' -> (maps NCHW, coords
[N,K,2] in [0,1]); 'heatmap' -> maps; 'angleregression' -> [N,2]), so it
drops into the fused EgoNet pipeline, both trainers, serving and the
checkpoint interchange unchanged.  Select it with
``heatmapModel.name: tpu_native`` (see configs/KITTI_tpu_native.yml).

Conventions shared with the rest of the package: NHWC, bf16 compute with
fp32 params/BN statistics (fp64-promotable for differentials), two-pass
BN variance, optional int8 activation transport across fusion boundaries.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from egonet_tpu.models.hrnet import _pixel_shuffle

BN_MOMENTUM = 0.9


class PoseNetTPU(nn.Module):
    """MBConv backbone + pixel-shuffle FPN + EgoNet heads."""

    depths: tuple = (1, 3, 9)           # blocks per stage (most depth at
                                        # the last stage where measured MXU
                                        # util is ~75%; the first stage is
                                        # HBM-bound so it stays shallow)
    widths: tuple = (256, 512, 1024)    # channels per stage (x128
                                        # multiples).  Round-4 default is
                                        # the stride-8 plan (32^2x256 /
                                        # 16^2x512 / 8^2x1024, swept
                                        # on-chip: 6,752 crops/s @ 0.569
                                        # MFU); the round-3 stride-4 plan
                                        # was (128, 256, 512)
    expansion: Any = (2, 3, 4)          # pw hidden = width * expansion;
                                        # int (uniform) or per-stage tuple —
                                        # the first stage is HBM-bound (AI
                                        # ~80 FLOP/B vs the ~240 v5e ridge),
                                        # so a leaner expand there cuts
                                        # traffic where FLOPs are not the
                                        # limit
    num_joints: int = 33
    head_type: str = "coordinates"
    heatmap_size: tuple = (64, 64)      # (width, height) — config order
    input_size: tuple = (256, 256)      # (width, height)
    head_width: int = 128               # coordinate/angle trunk channels
    in_channels: int = 3
    dtype: Any = jnp.float32
    act_quant: str = "none"
    act_quant_scale: float = 8.0
    grid_stride: int = 8                # base feature stride: 8 (default,
                                        # round 4) — one 8x8 patchify-
                                        # matmul stem, all stages/FPN/heads
                                        # at <= in/8, the 64^2 heatmap
                                        # emitted by channel-to-space
                                        # (VERDICT r3 #4: the 64^2x128
                                        # stage was HBM-bound at ANY
                                        # expansion, so it is REMOVED, not
                                        # rebalanced); 4 = the round-3
                                        # legacy trunk

    # ---------------- primitives (same policies as hrnet.py) -------------

    @property
    def _precision(self):
        return (jax.lax.Precision.DEFAULT
                if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST)

    @property
    def _stat_dtype(self):
        return jnp.promote_types(jnp.float32, self.dtype)

    def _conv(self, x, out_ch, k, stride, name, padding=None, use_bias=False,
              groups=1):
        if padding is None:
            padding = (k - 1) // 2
        return nn.Conv(out_ch, (k, k), strides=(stride, stride),
                       padding=[(padding, padding), (padding, padding)],
                       feature_group_count=groups, use_bias=use_bias,
                       dtype=self.dtype, precision=self._precision,
                       param_dtype=jnp.float32, name=name)(x)

    def _bn(self, x, name, train):
        # two-pass batch variance: see models/hrnet.py _bn — the fast
        # one-pass variance loses ~3 digits of train-mode gradient accuracy
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=self._stat_dtype,
                         param_dtype=jnp.float32, use_fast_variance=False,
                         name=name)(x)
        return y.astype(self.dtype)

    def _transport(self, x):
        """uint8 quantize-dequantize across fusion boundaries (post-ReLU
        tensors only) when act_quant='int8' — identical scheme to hrnet."""
        if self.act_quant != "int8":
            return x
        inv_step = 255.0 / self.act_quant_scale
        q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_step),
                     0.0, 255.0).astype(jnp.uint8)
        q = jax.lax.optimization_barrier(q)
        return (q.astype(self.dtype)
                * jnp.asarray(1.0 / inv_step, self.dtype))

    # ---------------- blocks ----------------

    def _expansion_for(self, stage: int) -> int:
        if isinstance(self.expansion, (tuple, list)):
            return int(self.expansion[min(stage, len(self.expansion) - 1)])
        return int(self.expansion)

    def _mbconv(self, x, width, prefix, train, stride=1, stage=None):
        """Inverted bottleneck: 1x1 expand -> dw 3x3 -> 1x1 project, with
        BN+ReLU between and a ReLU'd residual sum.  The two pointwise convs
        carry ~99% of the FLOPs and are full-width MXU matmuls."""
        exp = (self._expansion_for(stage) if stage is not None
               else self._expansion_for(len(self.depths) - 1))
        hidden = width * exp
        in_ch = x.shape[-1]
        y = self._conv(x, hidden, 1, 1, f"{prefix}.pw1", padding=0)
        y = self._bn(y, f"{prefix}.bn1", train)
        y = nn.relu(y)
        y = self._conv(y, hidden, 3, stride, f"{prefix}.dw",
                       groups=hidden)
        y = self._bn(y, f"{prefix}.bn2", train)
        y = nn.relu(y)
        y = self._conv(y, width, 1, 1, f"{prefix}.pw2", padding=0)
        y = self._bn(y, f"{prefix}.bn3", train)
        if stride != 1 or in_ch != width:
            x = self._conv(x, width, 1, stride, f"{prefix}.shortcut.0",
                           padding=0)
            x = self._bn(x, f"{prefix}.shortcut.1", train)
        return self._transport(nn.relu(x + y))

    def _downsample(self, x, out_ch, prefix, train):
        """Stride-2 2x2 patch conv (ConvNeXt-style): contraction
        2*2*C_in >= 512 — itself a full-fill matmul."""
        y = self._conv(x, out_ch, 2, 2, f"{prefix}.conv", padding=0)
        y = self._bn(y, f"{prefix}.bn", train)
        return nn.relu(y)

    def _lateral_up(self, top, out_ch, prefix, train):
        """1x1 matmul to 4*out_ch then pixel-shuffle x2: channel-to-space
        upsampling whose only compute is a full-width matmul."""
        y = self._conv(top, 4 * out_ch, 1, 1, f"{prefix}.conv", padding=0)
        y = self._bn(y, f"{prefix}.bn", train)
        y = nn.relu(y)
        return _pixel_shuffle(y, 2)

    # ---------------- heads (contract of hrnet.py:294-351) ----------------

    def _emit_maps(self, y0, train):
        """K-channel heatmaps at the configured heatmap_size.  On the
        stride-8 grid the 64^2 maps are produced by channel-to-space from
        the 32^2 features — a full-width 1x1 matmul plus a free reshape,
        instead of any 64^2 convolution ("deeper pixel-shuffle decoder")."""
        k = self.num_joints
        map_w, map_h = int(self.heatmap_size[0]), int(self.heatmap_size[1])
        y0_h = y0.shape[1]
        if map_h == y0_h:
            return self._conv(y0, k, 1, 1, "head1.0", padding=0,
                              use_bias=True)
        fac = map_h // y0_h
        assert map_h % y0_h == 0 and fac * y0.shape[2] == map_w, (
            f"heatmap {map_h}x{map_w} not a multiple of grid "
            f"{y0.shape[1]}x{y0.shape[2]}")
        y = self._conv(y0, k * fac * fac, 1, 1, "head1.0", padding=0,
                       use_bias=True)
        return _pixel_shuffle(y, fac)

    def _coordinates_head_s8(self, y0, train):
        """Stride-8 coordinate head: the regression trunk consumes the
        FULL-width grid features + xy maps (not the K-channel heatmaps —
        the legacy trunk's K+2 input is an information bottleneck the
        shrunken closed loop measured at ~40 AOS points, round 3), and
        every trunk block runs at <= 32^2."""
        k = self.num_joints
        maps = self._emit_maps(y0, train)
        gh, gw = y0.shape[1], y0.shape[2]
        xs = np.tile(np.linspace(0, 1, gw, dtype=np.float32), (gh, 1))
        ysc = np.tile(np.linspace(0, 1, gh, dtype=np.float32)[:, None],
                      (1, gw))
        coor = jnp.asarray(np.stack([xs, ysc], axis=-1))
        coor = jnp.broadcast_to(coor, (y0.shape[0],) + coor.shape)
        h = jnp.concatenate([y0, coor.astype(y0.dtype)], axis=-1)
        downs = max(0, int(np.log2(gh // 4)))
        for b in range(downs):
            h = self._mbconv(h, self.head_width, f"head2.{b}", train,
                             stride=2)
        h = nn.Conv(2 * k, (h.shape[1], h.shape[2]), padding="VALID",
                    use_bias=True, dtype=self.dtype,
                    precision=self._precision, param_dtype=jnp.float32,
                    name=f"head2.{downs}")(h)
        coords = nn.sigmoid(h.astype(self._stat_dtype))
        coords = coords.reshape(coords.shape[0], -1, 2)
        return maps.astype(self._stat_dtype).transpose(0, 3, 1, 2), coords

    def _coordinates_head(self, y0, train):
        k = self.num_joints
        map_w, map_h = int(self.heatmap_size[0]), int(self.heatmap_size[1])
        maps = self._conv(y0, k, 1, 1, "head1.0", padding=0, use_bias=True)
        xs = np.tile(np.linspace(0, 1, map_w, dtype=np.float32), (map_h, 1))
        ysc = np.tile(np.linspace(0, 1, map_h, dtype=np.float32)[:, None],
                      (1, map_w))
        coor = jnp.asarray(np.stack([xs, ysc], axis=-1))          # [H, W, 2]
        coor = jnp.broadcast_to(coor, (maps.shape[0],) + coor.shape)
        h = jnp.concatenate([maps, coor.astype(maps.dtype)], axis=-1)
        for b in range(4):
            h = self._mbconv(h, self.head_width, f"head2.{b}", train,
                             stride=2)
        ks = (map_h // 16, map_w // 16)
        h = nn.Conv(2 * k, ks, padding="VALID", use_bias=True,
                    dtype=self.dtype, precision=self._precision,
                    param_dtype=jnp.float32, name="head2.4")(h)
        coords = nn.sigmoid(h.astype(self._stat_dtype))
        coords = coords.reshape(coords.shape[0], -1, 2)           # [N, K, 2]
        return maps.astype(self._stat_dtype).transpose(0, 3, 1, 2), coords

    def _heatmap_head(self, y0, train):
        if self.grid_stride == 8:
            x = self._emit_maps(y0, train)
            return x.astype(self._stat_dtype).transpose(0, 3, 1, 2)
        x = self._conv(y0, self.num_joints, 1, 1, "final_layer",
                       padding=0, use_bias=True)
        return x.astype(self._stat_dtype).transpose(0, 3, 1, 2)

    def _angle_head(self, y0, train):
        h = self._conv(y0, self.head_width, 1, 1, "head.0", padding=0,
                       use_bias=True)
        # pool down to 4^2 before the global mean (4 blocks from the
        # legacy 64^2 grid, fewer from the stride-8 32^2 grid)
        downs = max(1, int(np.log2(max(4, y0.shape[1]) // 4)))
        for b in range(1, downs + 1):
            h = self._mbconv(h, self.head_width, f"head.{b}", train,
                             stride=2)
        h = jnp.mean(h, axis=(1, 2)).astype(self._stat_dtype)
        h = nn.Dense(256, dtype=self._stat_dtype,
                     precision=jax.lax.Precision.HIGHEST,
                     name="final_fc.0")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=1e-5, dtype=self._stat_dtype,
                         use_fast_variance=False, name="final_fc.1")(h)
        h = nn.relu(h)
        return nn.Dense(2, dtype=self._stat_dtype,
                        precision=jax.lax.Precision.HIGHEST,
                        name="final_fc.3")(h)

    # ---------------- forward ----------------

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [N, H, W, C] normalized crops — same contract as hrnet."""
        x = x.astype(self.dtype)
        if self.grid_stride == 8:
            # patchify stem: ONE 8x8/s8 conv == a [N*(H/8)*(W/8), 192] x
            # [192, W0] matmul.  No intermediate 128^2/64^2 tensors exist
            # at all — the whole HBM-bound high-resolution regime of the
            # stride-4 stem (measured 450-670 GB/s at ANY expansion,
            # docs/performance.md) is gone, not rebalanced.
            x = self._conv(x, self.widths[0], 8, 8, "stem.patch",
                           padding=0)
            x = self._bn(x, "stem.bn1", train)
            x = nn.relu(x)
        else:
            # stem: two stride-2 3x3s (256 -> 64), landing at widths[0]
            x = self._conv(x, 64, 3, 2, "stem.conv1")
            x = self._bn(x, "stem.bn1", train)
            x = nn.relu(x)
            x = self._conv(x, self.widths[0], 3, 2, "stem.conv2")
            x = self._bn(x, "stem.bn2", train)
            x = nn.relu(x)

        feats = []
        for s, (depth, width) in enumerate(zip(self.depths, self.widths)):
            if s > 0:
                x = self._downsample(x, width, f"down{s}", train)
            for b in range(depth):
                x = self._mbconv(x, width, f"stage{s}.{b}", train, stage=s)
            feats.append(x)

        # top-down pixel-shuffle FPN back to stride 4
        y = feats[-1]
        for s in range(len(feats) - 2, -1, -1):
            y = feats[s] + self._lateral_up(y, self.widths[s], f"up{s}",
                                            train)
            y = self._mbconv(y, self.widths[s], f"fpn{s}", train, stage=s)
        y0 = y                     # [N, in/grid_stride, in/grid_stride, W0]

        if self.head_type == "coordinates":
            if self.grid_stride == 8:
                return self._coordinates_head_s8(y0, train)
            return self._coordinates_head(y0, train)
        if self.head_type == "heatmap":
            return self._heatmap_head(y0, train)
        if self.head_type == "angleregression":
            return self._angle_head(y0, train)
        raise NotImplementedError(self.head_type)


def build_tpu_native(cfgs: dict, dtype=jnp.float32) -> PoseNetTPU:
    """Construct from a config dict.  ``heatmapModel.extra`` may carry
    depths/widths/expansion/head_width; everything else follows the shared
    heatmapModel schema."""
    hm = cfgs["heatmapModel"]
    extra = hm.get("extra", {}) or {}
    in_ch = 5 if hm.get("add_xy", False) else 3
    exp = extra.get("expansion", (2, 3, 4))
    if isinstance(exp, (tuple, list)):
        exp = tuple(int(e) for e in exp)
    else:
        exp = int(exp)
    return PoseNetTPU(
        depths=tuple(int(d) for d in extra.get("depths", (1, 3, 9))),
        widths=tuple(int(w) for w in extra.get("widths", (256, 512, 1024))),
        expansion=exp,
        num_joints=int(hm["num_joints"]),
        head_type=hm.get("head_type", "coordinates"),
        heatmap_size=tuple(hm.get("heatmap_size", (64, 64))),
        input_size=tuple(hm.get("input_size", (256, 256))),
        head_width=int(extra.get("head_width", 128)),
        in_channels=in_ch,
        dtype=dtype,
        act_quant=str(hm.get("act_quant", "none")),
        act_quant_scale=float(hm.get("act_quant_scale", 8.0)),
        grid_stride=int(extra.get("grid_stride", 8)),
    )
