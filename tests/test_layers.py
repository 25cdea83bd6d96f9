"""Unit + golden tests for core layers, using torch (CPU) as the oracle for
the semantics the reference defines (SURVEY.md §4: LayerNorm2d vs reference
semantics, schedule math, etc.)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from flowerdiff.core import (
    CALayer,
    LayerNorm2d,
    ResidualBlock,
    SpatialAttention,
    sinusoidal_time_embedding,
    swish,
)


def test_swish_matches_torch():
    x = np.random.default_rng(0).normal(size=(4, 7)).astype(np.float32)
    ours = np.asarray(swish(jnp.asarray(x)))
    ref = (torch.from_numpy(x) * torch.sigmoid(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_layernorm2d_matches_reference_semantics():
    """v1:151-156: normalize each (sample, channel) spatial map with biased
    variance, then per-channel affine."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 6, 3)).astype(np.float32) * 3 + 1
    weight = rng.normal(size=(3,)).astype(np.float32)
    bias = rng.normal(size=(3,)).astype(np.float32)

    ln = LayerNorm2d(3)
    params = {"params": {"weight": jnp.asarray(weight), "bias": jnp.asarray(bias)}}
    ours = np.asarray(ln.apply(params, jnp.asarray(x)))

    # Torch oracle in NCHW with the reference's exact formula.
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    mean = xt.mean(dim=(2, 3), keepdim=True)
    var = xt.var(dim=(2, 3), keepdim=True, unbiased=False)
    ref = (xt - mean) / torch.sqrt(var + 1e-5)
    ref = ref * torch.from_numpy(weight).view(1, -1, 1, 1) + torch.from_numpy(
        bias
    ).view(1, -1, 1, 1)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_layernorm2d_normalizes():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4)) * 5 + 2
    ln = LayerNorm2d(4)
    y = ln.apply(ln.init(jax.random.key(1), x), x)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, axis=(1, 2))), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.var(y, axis=(1, 2))), 1, atol=1e-2)


def test_ca_layer_is_channel_gate():
    """Output must equal input scaled per-channel by a (0,1) gate."""
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 16))
    ca = CALayer(16)
    y = ca.apply(ca.init(jax.random.key(1), x), x)
    gate = np.asarray(y) / np.asarray(x)
    # same gate across spatial positions
    np.testing.assert_allclose(
        gate, np.broadcast_to(gate[:, :1, :1, :], gate.shape), atol=1e-5
    )
    assert (gate > 0).all() and (gate < 1).all()


def test_spatial_attention_is_spatial_gate():
    x = jax.random.normal(jax.random.key(0), (2, 6, 6, 8)) + 2.0
    sa = SpatialAttention()
    y = sa.apply(sa.init(jax.random.key(1), x), x)
    gate = np.asarray(y) / np.asarray(x)
    # same gate across channels
    np.testing.assert_allclose(
        gate, np.broadcast_to(gate[..., :1], gate.shape), atol=1e-5
    )
    assert (gate > 0).all() and (gate < 1).all()


def test_residual_block_shape_and_jit():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    block = ResidualBlock(16)
    params = block.init(jax.random.key(1), x)
    y = jax.jit(block.apply)(params, x)
    assert y.shape == x.shape
    assert jnp.isfinite(y).all()


def test_sinusoidal_embedding_matches_reference_formula():
    """v1:409-417: freq_k = exp(-log(1e4) * k / (half-1)), concat(sin, cos)."""
    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    dim = 256
    ours = np.asarray(sinusoidal_time_embedding(jnp.asarray(t), dim))
    half = dim // 2
    # float32 oracle — the reference computes the frequency table in float32
    # (v1:411-412); float64 freqs would diverge at large t by ~1e-3 after sin.
    emb = np.exp(
        (np.arange(half, dtype=np.float32) * np.float32(-np.log(10000.0) / (half - 1)))
    ).astype(np.float32)
    args = t[:, None] * emb[None, :]
    ref = np.concatenate([np.sin(args), np.cos(args)], axis=1).astype(np.float32)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_sinusoidal_embedding_odd_dim_pads():
    out = sinusoidal_time_embedding(jnp.array([3.0]), 7)
    assert out.shape == (1, 7)
    assert float(out[0, -1]) == 0.0
