"""Shape/jit tests for every model (SURVEY.md §4: 'shape/jit tests for every
module'). Tiny widths keep CPU compiles fast; the reference-width configs are
covered by the smoke pipeline test and the bench."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowerdiff.models import (
    ConditionalLatentDenoiser,
    Discriminator64,
    FlowerVAE,
    PixelUNet,
)
from flowerdiff.models.vae import Decoder, Encoder

TINY = dict(channels=(8, 16, 24, 32), head_width=32)


@pytest.fixture(scope="module")
def tiny_vae_setup():
    vae = FlowerVAE(latent_dim=16, num_classes=7, **TINY)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params = vae.init(
        {"params": jax.random.key(1)}, x, jax.random.key(2),
        method=FlowerVAE.init_all,
    )
    return vae, params, x


def test_vae_roundtrip_shapes(tiny_vae_setup):
    vae, params, x = tiny_vae_setup
    recon, mu, logvar, z = jax.jit(vae.apply)(params, x, jax.random.key(3))
    assert recon.shape == (2, 64, 64, 3)
    assert mu.shape == logvar.shape == z.shape == (2, 16)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0  # sigmoid out
    logits = vae.apply(params, z, method=FlowerVAE.classify)
    assert logits.shape == (2, 7)


def test_vae_logvar_clamped(tiny_vae_setup):
    vae, params, x = tiny_vae_setup
    _, logvar = vae.apply(params, x, method=FlowerVAE.encode_with_params)
    assert float(logvar.min()) >= -2.0 and float(logvar.max()) <= 10.0


def test_reparameterize_statistics():
    mu = jnp.zeros((50_000, 2))
    logvar = jnp.full((50_000, 2), 0.5)
    z = FlowerVAE.reparameterize(jax.random.key(0), mu, logvar)
    np.testing.assert_allclose(float(jnp.mean(z)), 0.0, atol=0.02)
    np.testing.assert_allclose(float(jnp.var(z)), np.exp(0.5), rtol=0.05)


def test_encoder_channel_progression():
    enc = Encoder(latent_dim=16, **TINY)
    x = jnp.zeros((1, 64, 64, 3))
    params = enc.init(jax.random.key(0), x)
    # three stride-2 downs: deepest feature map must be 8x8 x channels[-1]
    flat_in = params["params"]["mu_fc1"]["kernel"].shape[0]
    assert flat_in == 8 * 8 * TINY["channels"][-1]


def test_latent_denoiser_variants():
    z = jnp.zeros((2, 16))
    t = jnp.array([0, 999])
    c = jnp.array([1, 2])
    color = jnp.array([0, 3])
    common = dict(latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16,
                  num_classes=7)

    v1 = ConditionalLatentDenoiser(**common)
    p1 = v1.init(jax.random.key(0), z, t, c)
    assert jax.jit(v1.apply)(p1, z, t, c).shape == (2, 16)
    # v1 quirk: no separate per-stage cond projections exist (v1:544)
    assert "cond_proj_0" not in p1["params"]

    v2 = ConditionalLatentDenoiser(global_skip=True, **common)
    p2 = v2.init(jax.random.key(0), z, t, c)
    assert v2.apply(p2, z, t, c).shape == (2, 16)

    v3 = ConditionalLatentDenoiser(shared_cond_proj=False, num_colors=4, **common)
    p3 = v3.init(jax.random.key(0), z, t, c, color)
    assert v3.apply(p3, z, t, c, color).shape == (2, 16)
    assert "cond_proj_0" in p3["params"]


def test_latent_denoiser_v2_skip_changes_output():
    """residual_weight exists in both variants (ckpt parity, v1:533) but only
    contributes when global_skip=True (v2:561)."""
    z = jax.random.normal(jax.random.key(5), (2, 16))
    t, c = jnp.array([10, 20]), jnp.array([0, 1])
    common = dict(latent_dim=16, hidden_dims=(16, 16), time_emb_dim=16,
                  num_classes=7)
    m1 = ConditionalLatentDenoiser(**common)
    m2 = ConditionalLatentDenoiser(global_skip=True, **common)
    params = m1.init(jax.random.key(0), z, t, c)
    out1 = m1.apply(params, z, t, c)
    out2 = m2.apply(params, z, t, c)  # same params, different wiring
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_discriminator_logits():
    x = jax.random.uniform(jax.random.key(0), (3, 64, 64, 3))
    disc = Discriminator64()
    params = disc.init(jax.random.key(1), x)
    logits = jax.jit(disc.apply)(params, x)
    assert logits.shape == (3,)


def test_pixel_unet_shapes_and_residual():
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    t = jnp.array([5, 500])
    for residual in (False, True):
        unet = PixelUNet(base_channels=8, time_emb_dim=16,
                         learnable_residual=residual)
        params = unet.init(jax.random.key(1), x, t)
        out = jax.jit(unet.apply)(params, x, t)
        assert out.shape == x.shape
        assert ("res_ratio" in params["params"]) == residual


def test_pixel_unet_time_conditioning_matters():
    x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
    unet = PixelUNet(base_channels=8, time_emb_dim=16)
    params = unet.init(jax.random.key(1), x, jnp.array([0]))
    a = unet.apply(params, x, jnp.array([0]))
    b = unet.apply(params, x, jnp.array([900]))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_bf16_compute_dtype():
    """Mixed precision: params stay float32, bf16 compute stays close to the
    f32 forward, and the epsilon/mu/logvar heads emit float32."""
    vae16 = FlowerVAE(latent_dim=16, num_classes=7, dtype=jnp.bfloat16, **TINY)
    vae32 = FlowerVAE(latent_dim=16, num_classes=7, **TINY)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    params = vae32.init({"params": jax.random.key(1)}, x, jax.random.key(2),
                        method=FlowerVAE.init_all)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))

    r32, mu32, lv32, _ = vae32.apply(params, x, jax.random.key(3))
    r16, mu16, lv16, _ = vae16.apply(params, x, jax.random.key(3))
    assert mu16.dtype == jnp.float32 and r16.dtype == jnp.float32
    assert float(jnp.abs(r16 - r32).max()) < 0.1  # sigmoid-scale outputs
    assert float(jnp.abs(mu16 - mu32).max()) < 0.35 * float(jnp.abs(mu32).max() + 1)

    den16 = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16,
        num_classes=7, dtype=jnp.bfloat16,
    )
    den32 = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=7,
    )
    z = jax.random.normal(jax.random.key(4), (2, 16))
    t, c = jnp.array([1, 40]), jnp.array([0, 3])
    dp = den32.init(jax.random.key(5), z, t, c)
    o32 = den32.apply(dp, z, t, c)
    o16 = den16.apply(dp, z, t, c)
    assert o16.dtype == jnp.float32
    scale = float(jnp.abs(o32).max())
    assert float(jnp.abs(o16 - o32).max()) < 5e-2 * scale
