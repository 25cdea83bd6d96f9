"""Golden cross-framework parity tests (VERDICT r1 item 10).

torch (CPU) is available in this environment, so the layer-semantics claims
the docstrings assert — flax `ConvTranspose(k4,s2,SAME)` == torch
`ConvTranspose2d(k4,s2,p1)` (models/vae.py:101-103), strided-conv padding,
GroupNorm channel grouping across NHWC/NCHW, LayerNorm2d vs the reference
formula (v1/model_train_test.py:144-156) — are pinned here by porting the
SAME weights into a torch replica and asserting forward agreement.

These tests do NOT copy reference code; the torch modules are built from
torch's own layer library with our weights loaded into them.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

torch = pytest.importorskip("torch")

from flowerdiff.core.layers import LayerNorm2d
from flowerdiff.losses.distances import euclidean_distance_loss

TOL = dict(rtol=1e-5, atol=1e-5)


def _np(x):
    return np.asarray(x)


def test_conv_transpose_matches_torch_k4s2p1():
    """flax ConvTranspose(k4, s2, SAME) == torch ConvTranspose2d(k4, s2, p1).
    Weight mapping: spatial flip + (kh,kw,in,out)->(in,out,kh,kw)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    m = nn.ConvTranspose(6, (4, 4), strides=(2, 2), padding="SAME")
    p = m.init(jax.random.key(0), jnp.asarray(x))
    ours = _np(m.apply(p, jnp.asarray(x)))
    assert ours.shape == (2, 16, 16, 6)  # exact 2x upsampling

    k = _np(p["params"]["kernel"])
    tm = torch.nn.ConvTranspose2d(4, 6, 4, stride=2, padding=1)
    with torch.no_grad():
        tm.weight.copy_(torch.tensor(k[::-1, ::-1].transpose(2, 3, 0, 1).copy()))
        tm.bias.copy_(torch.tensor(_np(p["params"]["bias"])))
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), **TOL)


def test_strided_conv_matches_torch_k4s2p1():
    """flax Conv(k4, s2, padding=((1,1),(1,1))) == torch Conv2d(k4, s2, p=1)
    (the encoder downsampling stages, models/vae.py:52-54 vs v1:191-207)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    m = nn.Conv(8, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)))
    p = m.init(jax.random.key(1), jnp.asarray(x))
    ours = _np(m.apply(p, jnp.asarray(x)))
    assert ours.shape == (2, 8, 8, 8)

    k = _np(p["params"]["kernel"])  # (kh, kw, in, out)
    tm = torch.nn.Conv2d(3, 8, 4, stride=2, padding=1)
    with torch.no_grad():
        tm.weight.copy_(torch.tensor(k.transpose(3, 2, 0, 1).copy()))
        tm.bias.copy_(torch.tensor(_np(p["params"]["bias"])))
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), **TOL)


def test_group_norm_matches_torch():
    """flax GroupNorm on NHWC groups channels the same way torch GroupNorm
    groups NCHW (the decoder's ch//8-group norms, models/vae.py:100-107)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 8, 8, 16)).astype(np.float32)
    gamma = rng.normal(size=16).astype(np.float32)
    beta = rng.normal(size=16).astype(np.float32)

    m = nn.GroupNorm(num_groups=4)
    p = {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    ours = _np(m.apply(p, jnp.asarray(x)))

    tm = torch.nn.GroupNorm(4, 16)
    with torch.no_grad():
        tm.weight.copy_(torch.tensor(gamma))
        tm.bias.copy_(torch.tensor(beta))
        theirs = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), **TOL)


def test_layernorm2d_matches_reference_formula_in_torch():
    """LayerNorm2d == the reference's custom formula (v1:144-156): per
    (sample, channel) statistics over (H, W), biased variance, eps 1e-5,
    per-channel affine — expressed independently in torch ops."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 6, 6, 5)).astype(np.float32)
    gamma = rng.normal(size=5).astype(np.float32)
    beta = rng.normal(size=5).astype(np.float32)

    m = LayerNorm2d(5)
    p = {"params": {"weight": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    ours = _np(m.apply(p, jnp.asarray(x)))

    xt = torch.tensor(x.transpose(0, 3, 1, 2))  # NCHW like the reference
    mean = xt.mean(dim=(2, 3), keepdim=True)
    var = xt.var(dim=(2, 3), keepdim=True, unbiased=False)
    yt = (xt - mean) / torch.sqrt(var + 1e-5)
    yt = yt * torch.tensor(gamma).view(1, -1, 1, 1) + torch.tensor(beta).view(1, -1, 1, 1)
    np.testing.assert_allclose(ours, yt.numpy().transpose(0, 2, 3, 1), **TOL)


def test_euclidean_distance_loss_matches_torch_norm():
    """euclidean_distance_loss == mean over batch of ||flatten(x-y)||_2 with
    the reference's +1e-8 stabilizer (v1:293-302)."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 3, 5, 5)).astype(np.float32)
    y = rng.normal(size=(4, 3, 5, 5)).astype(np.float32)
    ours = float(euclidean_distance_loss(jnp.asarray(x), jnp.asarray(y)))
    d = torch.tensor(x) - torch.tensor(y)
    theirs = float(torch.sqrt((d.flatten(1) ** 2).sum(dim=1) + 1e-8).mean())
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_dense_matches_torch_linear():
    """flax Dense == torch Linear under kernel transpose (the latent-denoiser
    MLP stages and VAE heads)."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(4, 12)).astype(np.float32)
    m = nn.Dense(7)
    p = m.init(jax.random.key(2), jnp.asarray(x))
    ours = _np(m.apply(p, jnp.asarray(x)))
    tm = torch.nn.Linear(12, 7)
    with torch.no_grad():
        tm.weight.copy_(torch.tensor(_np(p["params"]["kernel"]).T.copy()))
        tm.bias.copy_(torch.tensor(_np(p["params"]["bias"])))
        theirs = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, **TOL)
