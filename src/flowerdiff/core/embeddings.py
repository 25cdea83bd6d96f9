"""Time / class / multi-condition embeddings.

Parity targets:
  - TimeEmbedding           (v1/model_train_test.py:401-418)
  - ClassEmbedding          (v1/model_train_test.py:421-431)
  - MultiConditionEmbedding (v3/model_train_test.py:739-749)
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from flowerdiff.core.layers import kaiming_init, swish


def sinusoidal_time_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal position embedding, base 10000 (v1:409-417).

    emb_k = t * exp(-log(10000) * k / (half - 1)), concat(sin, cos), zero-pad
    to `dim` if odd. `t` is a float or int vector (B,).

    The frequency table is built from `lax.iota` (an on-device op) rather
    than `jnp.arange`: arange materializes a concrete array at trace time and
    becomes an embedded program constant, which carries a large per-call
    penalty on the axon TPU platform (measured ~25 ms).
    """
    half = dim // 2
    k = jax.lax.iota(jnp.float32, half)
    freqs = jnp.exp(k * (-math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if emb.shape[-1] < dim:
        emb = jnp.pad(emb, ((0, 0), (0, dim - emb.shape[-1])))
    return emb


class TimeEmbedding(nn.Module):
    """Sinusoidal embed -> Linear(d, 2d) -> swish -> Linear(2d, d) (v1:401-418)."""

    n_channels: int = 256

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        emb = sinusoidal_time_embedding(t, self.n_channels)
        emb = nn.Dense(self.n_channels * 2, kernel_init=kaiming_init, name="lin1")(emb)
        emb = swish(emb)
        return nn.Dense(self.n_channels, kernel_init=kaiming_init, name="lin2")(emb)


class ClassEmbedding(nn.Module):
    """Embedding(num_classes, d) -> Linear -> swish -> Linear (v1:421-431)."""

    num_classes: int = 102
    n_channels: int = 256

    @nn.compact
    def __call__(self, c: jax.Array) -> jax.Array:
        emb = nn.Embed(self.num_classes, self.n_channels, name="embedding")(c)
        emb = nn.Dense(self.n_channels, kernel_init=kaiming_init, name="lin1")(emb)
        emb = swish(emb)
        return nn.Dense(self.n_channels, kernel_init=kaiming_init, name="lin2")(emb)


class MultiConditionEmbedding(nn.Module):
    """Flower-class + color embeddings, concatenated then projected
    (v3:739-749): Embed(102, d) ++ Embed(10, d) -> Linear(2d, d).
    """

    num_classes: int = 102
    num_colors: int = 10
    n_channels: int = 256

    @nn.compact
    def __call__(self, flower: jax.Array, color: jax.Array) -> jax.Array:
        f_emb = nn.Embed(self.num_classes, self.n_channels, name="flower_embedding")(flower)
        c_emb = nn.Embed(self.num_colors, self.n_channels, name="color_embedding")(color)
        joint = jnp.concatenate([f_emb, c_emb], axis=-1)
        return nn.Dense(self.n_channels, kernel_init=kaiming_init, name="proj")(joint)
