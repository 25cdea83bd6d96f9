"""Conditional latent-space denoiser (the reference's "ConditionalUNet").

Parity target: v1/model_train_test.py:501-561 (v2 adds a learned global skip
at v2:561; v3 uses separate condition projections and dual class+color
conditioning, v3:769-853). It is an MLP hourglass over flat 256-d latents:

  latent_proj: 256 -> hidden[0]
  per stage i (hidden = [256, 512, 1024, 512, 256]):
     h += time_proj_i(t_emb); h += cond_proj_i(c_emb)
     h  = residual MLP block (Dense -> LayerNorm -> Dropout -> swish) + h
     h  = h + SelfAttention(LayerNorm(h))           # length-1 sequence
     h  = Dense(hidden[i] -> hidden[i+1])
  final: += time/cond projections -> LayerNorm -> Dense(hidden[-1] -> 256)

Faithful quirks, config-gated:
  - `shared_cond_proj=True` (v1/v2 parity): the CLASS embedding is projected
    through the TIME projection matrices (v1:544). v3 presets use separate
    projections (v3:818).
  - `global_skip=True` (v2:561): out += sigmoid(residual_weight) *
    final(x_input), reusing the same `final` layer. The parameter exists in
    all variants (v1:533) for checkpoint parity; only v2 applies it.
  - The reference's attention runs on a length-1 token sequence per sample
    (v1:550-552) — softmax over one key is 1, so at inference it reduces to
    out_proj(v_proj(x)). The Pallas sampling fast path
    (flowerdiff.kernels.latent_stage) exploits exactly this reduction.

Every stage is dense matmuls sized 256..1024 — MXU-friendly; the whole
forward is a fusion-friendly chain XLA compiles into a handful of kernels.
Model-parallel sharding rules for the stage weights live in
flowerdiff.parallel.sharding.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from flowerdiff.core.attention import MultiHeadSelfAttention
from flowerdiff.core.embeddings import (
    ClassEmbedding,
    MultiConditionEmbedding,
    TimeEmbedding,
)
from flowerdiff.core.layers import kaiming_init, swish


class ConditionalLatentDenoiser(nn.Module):
    latent_dim: int = 256
    hidden_dims: Sequence[int] = (256, 512, 1024, 512, 256)
    time_emb_dim: int = 256
    num_classes: int = 102
    num_colors: Optional[int] = None  # set (e.g. 10) for v3 dual conditioning
    dropout_rate: float = 0.3
    shared_cond_proj: bool = True  # v1/v2 quirk (v1:544); False for v3
    global_skip: bool = False  # v2:561
    dtype: Any = None  # compute dtype for the stage matmuls (params float32)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        cond: jax.Array,
        color: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        cond_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """cond_mask: optional (B,) 0/1 floats — 0 zeroes the condition
        embedding for that sample (the null condition for classifier-free
        guidance; beyond-reference capability, no extra parameters)."""
        hidden = tuple(self.hidden_dims)
        x_input = x

        t_base = TimeEmbedding(self.time_emb_dim, name="time_emb")(t)
        if self.num_colors is not None:
            assert color is not None, "v3 variant needs a color label"
            c_base = MultiConditionEmbedding(
                self.num_classes, self.num_colors, self.time_emb_dim, name="cond_emb"
            )(cond, color)
        else:
            c_base = ClassEmbedding(
                self.num_classes, self.time_emb_dim, name="cond_emb"
            )(cond)
        if cond_mask is not None:
            c_base = c_base * cond_mask[:, None].astype(c_base.dtype)

        h = nn.Dense(hidden[0], kernel_init=kaiming_init, dtype=self.dtype,
                     name="latent_proj")(x)

        for i in range(len(hidden) - 1):
            dim = hidden[i]
            time_proj = nn.Dense(dim, kernel_init=kaiming_init,
                                 dtype=self.dtype, name=f"time_proj_{i}")
            h = h + time_proj(t_base)
            if self.shared_cond_proj:
                h = h + time_proj(c_base)  # v1:544 — shared projection quirk
            else:
                h = h + nn.Dense(dim, kernel_init=kaiming_init,
                                 dtype=self.dtype, name=f"cond_proj_{i}")(c_base)

            # Residual MLP block: Dense -> LayerNorm -> Dropout -> swish (+res)
            blk = nn.Dense(dim, kernel_init=kaiming_init, dtype=self.dtype,
                           name=f"block_fc_{i}")(h)
            blk = nn.LayerNorm(dtype=self.dtype, name=f"block_ln_{i}")(blk)
            blk = nn.Dropout(self.dropout_rate, name=f"block_drop_{i}")(
                blk, deterministic=deterministic
            )
            blk = swish(blk)
            h = h + blk

            h_norm = nn.LayerNorm(dtype=self.dtype, name=f"stage_ln_{i}")(h)
            attn = MultiHeadSelfAttention(
                dim, num_heads=8, dropout_rate=self.dropout_rate,
                dtype=self.dtype, name=f"attn_{i}"
            )(h_norm[:, None, :], deterministic=deterministic)
            h = h + attn[:, 0, :]

            h = nn.Dense(hidden[i + 1], kernel_init=kaiming_init,
                         dtype=self.dtype, name=f"downsample_{i}")(h)

        h = h + nn.Dense(hidden[-1], kernel_init=kaiming_init,
                         dtype=self.dtype, name="final_time_proj")(t_base)
        h = h + nn.Dense(hidden[-1], kernel_init=kaiming_init,
                         dtype=self.dtype, name="final_cond_proj")(c_base)
        h = nn.LayerNorm(dtype=self.dtype, name="final_norm")(h)
        final = nn.Dense(self.latent_dim, kernel_init=kaiming_init, name="final")
        out = final(h.astype(jnp.float32))  # epsilon head emits float32

        residual_weight = self.param(
            "residual_weight", nn.initializers.constant(0.1), ()
        )
        if self.global_skip:
            out = out + jax.nn.sigmoid(residual_weight) * final(
                x_input.astype(jnp.float32)
            )
        return out
