"""Multi-head self-attention.

The reference's latent denoiser applies torch.nn.MultiheadAttention over a
length-1 token sequence per sample (v1/model_train_test.py:513-516, 550-552):
with one key, softmax is identically 1 and attention degenerates to
out_proj(v_proj(x)). We implement the *general* module (any sequence length,
packed qkv projection like torch) so the same block powers spatial attention
at higher resolutions, and document the length-1 degenerate case which the
Pallas fast path (flowerdiff.kernels) exploits during sampling.

Dropout on the attention weights matches torch's semantics (train-time only).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from flowerdiff.core.layers import kaiming_init


class SpatialSelfAttention2D(nn.Module):
    """2-D feature-map self-attention over H*W positions.

    Parity target: UNetAttentionBlock (v1/model_train_test.py:434-459) —
    GroupNorm(1) -> packed qkv 1x1 conv -> multi-head scaled-dot attention
    over the spatial positions -> 1x1 out conv -> +residual. Dead code in
    the reference (SURVEY.md §2.1) but the building block any pixel-UNet
    upgrade needs; NHWC, 1x1 convs as channel matmuls.

    This is also the module behind the framework's sequence-parallel seam
    (SURVEY.md §5.7): at higher resolutions the H*W axis can be sharded over
    a mesh axis; the einsum contractions then ride XLA collectives.
    """

    channels: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        assert c == self.channels and c % self.num_heads == 0
        residual = x
        y = nn.GroupNorm(num_groups=1, name="norm")(x)
        qkv = nn.Dense(3 * c, kernel_init=kaiming_init, name="qkv")(
            y.reshape(b, h * w, c)
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(b, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k) * hd**-0.5
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhst,bhtd->bhsd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, c)
        out = nn.Dense(c, kernel_init=kaiming_init, name="proj")(out)
        return out.reshape(b, h, w, c) + residual


class MultiHeadSelfAttention(nn.Module):
    """Self-attention over (B, S, D) with `num_heads` heads.

    Equivalent to torch.nn.MultiheadAttention(embed_dim=D, num_heads,
    dropout=p) applied with query=key=value (v1:513-516): packed qkv
    projection with bias, scaled dot-product, softmax(+dropout), out
    projection with bias.
    """

    dim: int
    num_heads: int = 8
    dropout_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        batch, seq, dim = x.shape
        assert dim == self.dim and dim % self.num_heads == 0
        head_dim = dim // self.num_heads

        qkv = nn.Dense(3 * dim, kernel_init=kaiming_init, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(batch, seq, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = head_dim**-0.5
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k) * scale
        weights = jax.nn.softmax(logits, axis=-1)
        if self.dropout_rate > 0.0:
            weights = nn.Dropout(self.dropout_rate, name="attn_drop")(
                weights, deterministic=deterministic
            )
        out = jnp.einsum("bhst,bhtd->bhsd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(batch, seq, dim)
        return nn.Dense(dim, kernel_init=kaiming_init, dtype=self.dtype,
                        name="out")(out)
