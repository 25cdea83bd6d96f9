"""VAE encoder / decoder / wrapper.

Parity targets:
  - Encoder           (v1/model_train_test.py:181-239): 64x64x3 -> conv stem 64
    -> three stride-2 4x4 downs (128/256/512, LayerNorm2d+swish) each followed
    by a ResidualBlock -> flatten 8*8*512 -> twin MLP heads (512, LN, swish,
    -> latent_dim) for mu / logvar.
  - Decoder           (v1:242-290): z -> MLP (512 -> 512*8*8, LayerNorms,
    swish) -> (8,8,512) -> ResidualBlock + 4x4 stride-2 transposed-conv ups
    (GroupNorm 32/16/8 + swish) -> 3x3 convs (32, GroupNorm 8) -> Sigmoid,
    outputs in [0,1]. The reference accepts-and-ignores encoder skip features
    (v1:280-290); we drop that dead argument.
  - FlowerVAE         (v1:305-393 `SimpleAutoencoder`): reparameterize with
    logvar clamp [-2, 10]; classifier head 256->512->256->102 with LayerNorm,
    swish, dropout(0.3/0.2); EMA class-center buffers are held in the train
    state (flowerdiff.train), not inside the module — functional JAX style.

NHWC layout. The flatten order (B, H, W, C) differs from the reference's
(B, C, H, W); this permutes rows of the first dense layer only, which is
irrelevant for from-scratch training.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flowerdiff.core.layers import LayerNorm2d, ResidualBlock, kaiming_init, swish

LOGVAR_MIN, LOGVAR_MAX = -2.0, 10.0


class Encoder(nn.Module):
    in_channels: int = 3
    latent_dim: int = 256
    channels: tuple = (64, 128, 256, 512)  # reference widths (v1:185-208)
    head_width: int = 512
    dtype: Any = None  # compute dtype (params stay float32)
    # Rematerialize the residual blocks on the backward pass: each block
    # holds ~8 conv/LN/attention intermediates; with remat only the block
    # INPUT is saved and the chain is recomputed in the bwd pass — an
    # HBM-traffic lever for the bandwidth-bound train step (BASELINE.md
    # roofline; the reference has no equivalent knob).
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        block = nn.remat(ResidualBlock) if self.remat else ResidualBlock
        # Stem: conv3x3 -> LN2d -> swish (v1:185-189)
        h = nn.Conv(self.channels[0], (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_init, name="stem_conv")(x)
        h = LayerNorm2d(self.channels[0], dtype=self.dtype, name="stem_ln")(h)
        h = swish(h)

        # Downsampling stages: conv4x4/s2 -> LN2d -> swish -> ResBlock
        for i, ch in enumerate(self.channels[1:], start=1):
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, kernel_init=kaiming_init,
                        name=f"down{i}_conv")(h)
            h = LayerNorm2d(ch, dtype=self.dtype, name=f"down{i}_ln")(h)
            h = swish(h)
            h = block(ch, dtype=self.dtype, name=f"res{i}")(h)

        flat = h.reshape(h.shape[0], -1)  # (B, 8*8*512) at reference size

        def head(name: str) -> jax.Array:
            y = nn.Dense(self.head_width, kernel_init=kaiming_init,
                         dtype=self.dtype, name=f"{name}_fc1")(flat)
            y = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(y)
            y = swish(y)
            # heads emit float32: mu/logvar feed clamps, KL, reparam noise
            return nn.Dense(self.latent_dim, kernel_init=kaiming_init,
                            name=f"{name}_fc2")(y.astype(jnp.float32))

        return head("mu"), head("logvar")


class Decoder(nn.Module):
    latent_dim: int = 256
    out_channels: int = 3
    channels: tuple = (64, 128, 256, 512)  # mirror of the encoder widths
    head_width: int = 512
    base_size: int = 8  # spatial size of the deepest feature map
    dtype: Any = None
    remat: bool = False  # see Encoder.remat

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        deep = self.channels[-1]
        h = nn.Dense(self.head_width, kernel_init=kaiming_init,
                     dtype=self.dtype, name="fc1")(z)
        h = nn.LayerNorm(dtype=self.dtype, name="fc1_ln")(h)
        h = swish(h)
        h = nn.Dense(deep * self.base_size**2, kernel_init=kaiming_init,
                     dtype=self.dtype, name="fc2")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="fc2_ln")(h)
        h = swish(h)
        h = h.reshape(-1, self.base_size, self.base_size, deep)

        n_ups = len(self.channels) - 1
        h = ResidualBlock(deep, dtype=self.dtype, name=f"res{n_ups}")(h)
        for i in range(n_ups, 0, -1):
            ch = self.channels[i - 1]
            # GroupNorm group counts follow the reference's ch/8 rule
            # (v1:257,263,269: 256->32, 128->16, 64->8 groups).
            groups = max(1, ch // 8)
            # kernel 4 / stride 2 / SAME == torch ConvTranspose2d(k=4,s=2,p=1):
            # exact 2x spatial upsampling.
            h = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype, kernel_init=kaiming_init,
                                 name=f"up{i}_conv")(h)
            h = nn.GroupNorm(num_groups=groups, dtype=self.dtype,
                             name=f"up{i}_gn")(h)
            h = swish(h)
            if i > 1:
                h = ResidualBlock(ch, dtype=self.dtype, name=f"res{i - 1}")(h)

        mid = max(4, self.channels[0] // 2)  # 32 at reference width (v1:273)
        h = nn.Conv(mid, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_init, name="final_conv1")(h)
        h = nn.GroupNorm(num_groups=max(1, mid // 4), dtype=self.dtype,
                         name="final_gn")(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_init, name="final_conv2")(h)
        return jax.nn.sigmoid(h.astype(jnp.float32))


class LatentClassifier(nn.Module):
    """3-layer classifier head on the latent (v1:311-321):
    256 -> 512 -> 256 -> num_classes with LayerNorm, swish, dropout 0.3/0.2."""

    num_classes: int = 102

    @nn.compact
    def __call__(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        h = nn.Dense(512, kernel_init=kaiming_init, name="fc1")(z)
        h = nn.LayerNorm(name="ln1")(h)
        h = swish(h)
        h = nn.Dropout(0.3, name="drop1")(h, deterministic=deterministic)
        h = nn.Dense(256, kernel_init=kaiming_init, name="fc2")(h)
        h = nn.LayerNorm(name="ln2")(h)
        h = swish(h)
        h = nn.Dropout(0.2, name="drop2")(h, deterministic=deterministic)
        return nn.Dense(self.num_classes, kernel_init=kaiming_init, name="out")(h)


class FlowerVAE(nn.Module):
    """VAE + classifier head (reference `SimpleAutoencoder`, v1:305-393)."""

    in_channels: int = 3
    latent_dim: int = 256
    num_classes: int = 102
    channels: tuple = (64, 128, 256, 512)
    head_width: int = 512
    base_size: int = 8
    dtype: Any = None  # compute dtype for the conv stacks (params float32)
    remat: bool = False  # rematerialize residual blocks (see Encoder.remat)

    def setup(self):
        self.encoder = Encoder(self.in_channels, self.latent_dim,
                               self.channels, self.head_width, self.dtype,
                               self.remat)
        self.decoder = Decoder(self.latent_dim, self.in_channels,
                               self.channels, self.head_width, self.base_size,
                               self.dtype, self.remat)
        self.classifier = LatentClassifier(self.num_classes)

    @staticmethod
    def reparameterize(rng: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
        """mu + eps * exp(0.5 * clamp(logvar)) (v1:339-343)."""
        logvar = jnp.clip(logvar, LOGVAR_MIN, LOGVAR_MAX)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, dtype=std.dtype)
        return mu + eps * std

    def encode_with_params(self, x: jax.Array):
        """(mu, clamped logvar) (v1:350-353)."""
        mu, logvar = self.encoder(x)
        return mu, jnp.clip(logvar, LOGVAR_MIN, LOGVAR_MAX)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def classify(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.classifier(z, deterministic=deterministic)

    def __call__(self, x: jax.Array, rng: jax.Array, deterministic: bool = True):
        """Full pass -> (recon, mu, logvar, z) (v1:388-393)."""
        mu, logvar = self.encoder(x)
        z = self.reparameterize(rng, mu, logvar)
        recon = self.decoder(z)
        return recon, mu, logvar, z

    def init_all(self, x: jax.Array, rng: jax.Array):
        """Initialization entry touching every submodule (flax only creates
        params for modules traced during init, and `__call__` alone never
        reaches the classifier head)."""
        recon, mu, logvar, z = self(x, rng)
        logits = self.classify(z)
        return recon, mu, logvar, z, logits
