"""Conv-stack building blocks.

Behavioral parity targets (cited into /root/reference, semantics re-derived,
not translated):
  - Swish activation          (v1/model_train_test.py:48-50)
  - CALayer channel attention (v1/model_train_test.py:53-67)
  - SpatialAttention          (v1/model_train_test.py:69-81)
  - LayerNorm2d               (v1/model_train_test.py:144-156)
  - ResidualBlock             (v1/model_train_test.py:159-178)

All modules are NHWC (TPU-native). The reference is NCHW PyTorch; only the
math is preserved, the layout and implementation are JAX/XLA-first: 1x1 convs
become channel matmuls the MXU likes, and the CA/SA gates are pure elementwise
chains XLA fuses into the surrounding convs.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any  # compute dtype; params always float32 (flax param_dtype default)

# Kaiming-normal init matching torch.nn.init.kaiming_normal_(w, a=0.2)
# (reference init policy, v1/model_train_test.py:326-337):
# std = sqrt(2 / ((1 + a^2) * fan_in))  -> variance scale 2/(1+0.04).
kaiming_init = nn.initializers.variance_scaling(
    scale=2.0 / (1.0 + 0.2**2), mode="fan_in", distribution="normal"
)


def swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (v1:48-50). jax.nn.silu is the fused XLA form."""
    return jax.nn.silu(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln2d_resident(x: jax.Array, weight: jax.Array, bias: jax.Array,
                   eps: float) -> jax.Array:
    """LayerNorm2d with compute-dtype-resident residuals.

    Plain autodiff of the f32-statistics formula saves the FULL-SIZE f32
    intermediates ((x32 - mean), the normalized tensor) for the backward —
    at 64x64 batch 256 those dominate the HBM traffic of the "bf16" VAE-GAN
    step. This custom vjp keeps the statistics math in f32 (per-(B,C)
    scalars, cheap) but saves only the bf16 normalized tensor + the tiny
    rsigma, and re-derives the standard LN backward
        dx = rsigma * (g - mean_hw(g) - xn * mean_hw(g * xn)),  g = dy * w
    from bf16 loads with f32 accumulation.
    """
    y, _ = _ln2d_resident_fwd(x, weight, bias, eps)
    return y


def _ln2d_resident_fwd(x, weight, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    rsigma = jax.lax.rsqrt(var + eps)
    xn = ((x32 - mean) * rsigma).astype(x.dtype)  # the ONE big residual, bf16
    y = xn * weight.astype(x.dtype) + bias.astype(x.dtype)
    return y, (xn, rsigma, weight)


def _ln2d_resident_bwd(eps, res, dy):
    xn, rsigma, weight = res
    dy32 = dy.astype(jnp.float32)
    xn32 = xn.astype(jnp.float32)
    dweight = jnp.sum(dy32 * xn32, axis=(0, 1, 2)).astype(weight.dtype)
    dbias = jnp.sum(dy32, axis=(0, 1, 2)).astype(weight.dtype)
    g = dy32 * weight  # (B,H,W,C), f32 math from bf16 loads
    gm = jnp.mean(g, axis=(1, 2), keepdims=True)
    gxn = jnp.mean(g * xn32, axis=(1, 2), keepdims=True)
    dx = (rsigma * (g - gm - xn32 * gxn)).astype(xn.dtype)
    return dx, dweight, dbias


_ln2d_resident.defvjp(_ln2d_resident_fwd, _ln2d_resident_bwd)


class LayerNorm2d(nn.Module):
    """Per-sample, per-channel normalization over the spatial dims.

    Matches the reference's custom LayerNorm2d (v1:144-156): mean/var are taken
    over (H, W) independently for every (sample, channel) pair — i.e. instance
    normalization with a per-channel affine. `var` uses the biased estimator
    (torch `unbiased=False`).

    NHWC input: (B, H, W, C).
    """

    num_channels: int
    eps: float = 1e-5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        if self.dtype is not None and self.dtype != jnp.float32:
            # bf16-resident path: f32 statistics, but the big saved residual
            # and the output stay in the compute dtype (custom vjp above) —
            # the HBM lever for the bandwidth-bound VAE-GAN step.
            return _ln2d_resident(x.astype(self.dtype), weight, bias, self.eps)
        # statistics in float32 for stability regardless of compute dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * weight + bias
        return y.astype(self.dtype or x.dtype)


class CALayer(nn.Module):
    """Squeeze-excite channel attention (v1:53-67).

    Global average pool -> 1x1 conv C->C/r -> swish -> 1x1 conv C/r->C ->
    sigmoid -> channel gate. In NHWC the 1x1 convs over a pooled (B,1,1,C)
    tensor are plain channel matmuls (Dense, no bias — the reference's convs
    have bias=False).
    """

    channels: int
    reduction: int = 8
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        hidden = nn.Dense(self.channels // self.reduction, use_bias=False,
                          kernel_init=kaiming_init, dtype=self.dtype,
                          name="squeeze")(pooled)
        hidden = swish(hidden)
        gate = nn.Dense(self.channels, use_bias=False,
                        kernel_init=kaiming_init, dtype=self.dtype,
                        name="excite")(hidden)
        gate = jax.nn.sigmoid(gate)
        return x * gate[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM-style spatial attention (v1:69-81).

    Channel-mean and channel-max maps -> concat (B,H,W,2) -> 7x7 conv -> sigmoid
    -> spatial gate.
    """

    kernel_size: int = 7
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        avg_map = jnp.mean(x, axis=-1, keepdims=True)
        max_map = jnp.max(x, axis=-1, keepdims=True)
        stacked = jnp.concatenate([avg_map, max_map], axis=-1)
        attn = nn.Conv(1, kernel_size=(self.kernel_size, self.kernel_size),
                       padding="SAME", use_bias=False, dtype=self.dtype,
                       kernel_init=kaiming_init, name="conv")(stacked)
        return x * jax.nn.sigmoid(attn)


class ConditionedResidualBlock(nn.Module):
    """2-D residual block with time/class FiLM-style shift conditioning.

    Parity target: UNetResidualBlock (v1/model_train_test.py:462-486) — dead
    code in the reference (SURVEY.md §2.1), kept as the conditioned conv
    block a full pixel-space conditional UNet needs: LN2d -> swish -> conv ->
    (+time shift) (+class shift) -> LN2d -> swish -> dropout -> conv ->
    +residual (1x1-projected when channel counts differ).
    """

    in_channels: int
    out_channels: int
    cond_dim: int = 256
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, t_emb=None, c_emb=None, *, deterministic=True):
        h = LayerNorm2d(self.in_channels, name="ln1")(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=kaiming_init, name="conv1")(h)
        if t_emb is not None:
            shift = swish(nn.Dense(self.out_channels, kernel_init=kaiming_init,
                                   name="time_emb")(t_emb))
            h = h + shift[:, None, None, :]
        if c_emb is not None:
            shift = swish(nn.Dense(self.out_channels, kernel_init=kaiming_init,
                                   name="class_emb")(c_emb))
            h = h + shift[:, None, None, :]
        h = LayerNorm2d(self.out_channels, name="ln2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout_rate, name="drop")(h, deterministic=deterministic)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    kernel_init=kaiming_init, name="conv2")(h)
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), kernel_init=kaiming_init,
                        name="residual_proj")(x)
        return h + x


class ResidualBlock(nn.Module):
    """conv3x3 -> LN2d -> swish -> conv3x3 -> LN2d -> CA -> SA -> +res -> swish.

    (v1:159-178.) The two attention gates and the residual/activation tail are
    elementwise; XLA fuses them into one VPU pass after each conv.
    """

    channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_init, name="conv1")(x)
        h = LayerNorm2d(self.channels, dtype=self.dtype, name="ln1")(h)
        h = swish(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=kaiming_init, name="conv2")(h)
        h = LayerNorm2d(self.channels, dtype=self.dtype, name="ln2")(h)
        h = CALayer(self.channels, dtype=self.dtype, name="ca")(h)
        h = SpatialAttention(dtype=self.dtype, name="sa")(h)
        return swish(h + residual)
