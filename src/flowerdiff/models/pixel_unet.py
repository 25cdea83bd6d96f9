"""Pixel-space 2-D UNet for the v4/v5 DDPM baseline.

Parity target: SimpleUNet (v4/model_train_test.py:37-134; v5 adds a learnable
output residual `out += res_ratio * x_input`, v5:54,144):

  - time path: scalar t -> Linear(1, 128) -> ReLU -> Linear(128, 128), then a
    per-stage Linear to each encoder stage's channel count, added as a
    (B,1,1,C) bias after the stage's convs (FiLM-style shift).
  - encoder: double-conv(64) -> 4x4/s2 down -> double-conv(128) -> down ->
    double-conv(256); bottleneck 256->512->256; decoder mirrors with 4x4/s2
    transposed convs and CONCAT skips (v4:127,131); 3x3 output conv.

All ReLU, NHWC, no normalization layers — faithful to the reference design.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flowerdiff.core.layers import kaiming_init


def _double_conv(h, ch, name, final_relu=True, dtype=None):
    h = nn.Conv(ch, (3, 3), padding="SAME", kernel_init=kaiming_init,
                dtype=dtype, name=f"{name}_a")(h)
    h = nn.relu(h)
    h = nn.Conv(ch, (3, 3), padding="SAME", kernel_init=kaiming_init,
                dtype=dtype, name=f"{name}_b")(h)
    if final_relu:
        h = nn.relu(h)
    return h


class PixelUNet(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    time_emb_dim: int = 128
    learnable_residual: bool = False  # v5:54,144
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        base = self.base_channels
        x_input = x

        # Scalar-t embedding (v4:42-47): raw float timestep through an MLP.
        t_emb = t.astype(jnp.float32).reshape(-1, 1)
        t_emb = nn.Dense(self.time_emb_dim, kernel_init=kaiming_init,
                         name="time_fc_a")(t_emb)
        t_emb = nn.relu(t_emb)
        t_emb = nn.Dense(self.time_emb_dim, kernel_init=kaiming_init,
                         name="time_fc_b")(t_emb)

        def stage_bias(ch, name):
            b = nn.Dense(ch, kernel_init=kaiming_init, name=name)(t_emb)
            return b[:, None, None, :]

        # Encoder
        x1 = _double_conv(x, base, "conv1", dtype=self.dtype) + stage_bias(base, "time_to_s1")
        x2 = nn.Conv(base * 2, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                     kernel_init=kaiming_init, dtype=self.dtype, name="down1")(x1)
        x2 = _double_conv(x2, base * 2, "conv2", dtype=self.dtype) + stage_bias(base * 2, "time_to_s2")
        x3 = nn.Conv(base * 4, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                     kernel_init=kaiming_init, dtype=self.dtype, name="down2")(x2)
        x3 = _double_conv(x3, base * 4, "conv3", dtype=self.dtype) + stage_bias(base * 4, "time_to_s3")

        # Bottleneck 256 -> 512 -> 256 (v4:74-79)
        h = nn.Conv(base * 8, (3, 3), padding="SAME", kernel_init=kaiming_init,
                    dtype=self.dtype, name="bottleneck_a")(x3)
        h = nn.relu(h)
        h = nn.Conv(base * 4, (3, 3), padding="SAME", kernel_init=kaiming_init,
                    dtype=self.dtype, name="bottleneck_b")(h)
        h = nn.relu(h)

        # Decoder with concat skips
        h = nn.ConvTranspose(base * 2, (4, 4), strides=(2, 2), padding="SAME",
                             kernel_init=kaiming_init, dtype=self.dtype,
                             name="up1")(h)
        h = jnp.concatenate([h, x2], axis=-1)
        h = _double_conv(h, base * 2, "conv4", dtype=self.dtype)
        h = nn.ConvTranspose(base, (4, 4), strides=(2, 2), padding="SAME",
                             kernel_init=kaiming_init, dtype=self.dtype,
                             name="up2")(h)
        h = jnp.concatenate([h, x1], axis=-1)
        h = _double_conv(h, base, "conv5", dtype=self.dtype)

        out = nn.Conv(self.in_channels, (3, 3), padding="SAME",
                      kernel_init=kaiming_init, name="out_conv")(
            h.astype(jnp.float32))  # epsilon head emits float32

        if self.learnable_residual:
            res_ratio = self.param("res_ratio", nn.initializers.constant(0.1), ())
            out = out + res_ratio * x_input
        return out
