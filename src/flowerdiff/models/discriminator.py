"""DCGAN-style 64x64 discriminator.

Parity target: Discriminator64 (v1/model_train_test.py:983-1007): four 4x4
stride-2 convs (64/128/256/512) with LeakyReLU(0.2) and BatchNorm on all but
the first, then a valid 4x4 conv to a single value per image.

Deviations, both deliberate and documented:
  - outputs LOGITS (no final Sigmoid): the loss uses fused
    sigmoid-cross-entropy (flowerdiff.losses.gan) for numerics.
  - BatchNorm is replaced by GroupNorm(32): cross-sample batch statistics
    create a device-count-dependent model under data parallelism (per-shard
    batch stats differ from the reference's global-batch stats anyway);
    GroupNorm is the standard batch-independent substitute and keeps the
    discriminator's behavior identical on every mesh shape.
"""
from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from flowerdiff.core.layers import kaiming_init


class Discriminator64(nn.Module):
    in_channels: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import jax.numpy as jnp

        h = x
        for i, ch in enumerate((64, 128, 256, 512)):
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        kernel_init=kaiming_init, dtype=self.dtype,
                        name=f"conv{i}")(h)
            if i > 0:
                h = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                 name=f"norm{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        # 4x4 valid conv -> (B, 1, 1, 1) -> logits (B,) in float32 (BCE)
        h = nn.Conv(1, (4, 4), padding="VALID", kernel_init=kaiming_init,
                    name="head")(h.astype(jnp.float32))
        return h.reshape(x.shape[0])
