"""Fully-connected 2D->3D lifting network in Flax.

Architecture spec: /root/reference/libs/model/FCmodel.py — Linear(in, 1024) +
BN + ReLU + Dropout(0.5), N x residual blocks (Linear-BN-ReLU-Drop x 2 with a
skip), Linear(1024, out).  Module names equal the torch ``state_dict`` key
prefixes (w1, batch_norm1, res_blocks.{i}.w1, ..., w2) for 1:1 checkpoint
conversion.

The matmuls are MXU-shaped (1024-wide) and run in the module dtype (fp32 by
default, bf16 for throughput); batch-norm statistics stay fp32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class FCModel(nn.Module):
    input_size: int = 66
    output_size: int = 96
    num_neurons: int = 1024
    num_blocks: int = 2
    p_dropout: float = 0.5
    leaky: bool = False
    dtype: Any = jnp.float32

    def _act(self, x):
        return nn.leaky_relu(x) if self.leaky else nn.relu(x)

    @property
    def _stat_dtype(self):
        return jnp.promote_types(jnp.float32, self.dtype)

    def _dense(self, x, features, name):
        import jax
        precision = (jax.lax.Precision.DEFAULT
                     if self.dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
        return nn.Dense(features, dtype=self.dtype, precision=precision,
                        param_dtype=jnp.float32, name=name)(x)

    def _bn(self, x, name, train):
        # two-pass batch variance: see models/hrnet.py _bn — the fast
        # one-pass variance loses ~3 digits of train-mode gradient accuracy
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self._stat_dtype,
                         param_dtype=jnp.float32, use_fast_variance=False,
                         name=name)(x)
        return y.astype(self.dtype)

    @nn.compact
    def __call__(self, x, train: bool = False,
                 apply_dropout: bool | None = None):
        """``apply_dropout=True`` keeps dropout stochastic while BN uses
        running statistics — the reference's dropout-at-test evaluation
        option (trainer.py:424-428, testing_settings.apply_dropout)."""
        drop = train if apply_dropout is None else bool(apply_dropout)
        x = x.astype(self.dtype)
        y = self._dense(x, self.num_neurons, "w1")
        y = self._bn(y, "batch_norm1", train)
        y = self._act(y)
        y = nn.Dropout(self.p_dropout, deterministic=not drop)(y)
        for i in range(self.num_blocks):
            p = f"res_blocks.{i}"
            z = self._dense(y, self.num_neurons, f"{p}.w1")
            z = self._bn(z, f"{p}.batch_norm1", train)
            z = self._act(z)
            z = nn.Dropout(self.p_dropout, deterministic=not drop)(z)
            z = self._dense(z, self.num_neurons, f"{p}.w2")
            z = self._bn(z, f"{p}.batch_norm2", train)
            z = self._act(z)
            z = nn.Dropout(self.p_dropout, deterministic=not drop)(z)
            y = y + z
        out = self._dense(y, self.output_size, "w2")
        return out.astype(self._stat_dtype)


def build_fc_model(cfgs: dict, dtype=jnp.float32) -> FCModel:
    """Construct from a reference-style config dict (cfgs['FCModel'])."""
    fc = cfgs["FCModel"]
    return FCModel(
        input_size=int(fc["input_size"]),
        output_size=int(fc["output_size"]),
        num_neurons=int(fc.get("num_neurons", 1024)),
        num_blocks=int(fc.get("num_blocks", 2)),
        p_dropout=float(fc.get("dropout", 0.5)),
        leaky=bool(fc.get("leaky", False)),
        dtype=dtype,
    )
