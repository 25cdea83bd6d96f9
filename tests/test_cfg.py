"""Classifier-free guidance tests (beyond-reference capability):
null-condition masking in the denoiser, guided eps combination in the
sampling facade, and condition dropout in the train step."""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.diffusion import linear_schedule
from flowerdiff.diffusion.api import DiffusionSampler
from flowerdiff.models import ConditionalLatentDenoiser, FlowerVAE
from flowerdiff.train.latent_ddpm import (
    LatentDiffusionConfig,
    create_latent_diffusion_state,
    make_latent_diffusion_step,
)

TINY = dict(latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16,
            num_classes=6)


def _model_params():
    model = ConditionalLatentDenoiser(**TINY)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    return model, params


def test_cond_mask_zero_erases_class_identity():
    model, params = _model_params()
    x = jax.random.normal(jax.random.key(1), (4, 16))
    t = jnp.full((4,), 3, jnp.int32)
    zeros = jnp.zeros((4,), jnp.float32)
    out_a = model.apply(params, x, t, jnp.full((4,), 1, jnp.int32),
                        cond_mask=zeros)
    out_b = model.apply(params, x, t, jnp.full((4,), 5, jnp.int32),
                        cond_mask=zeros)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # mask=1 is identical to no mask
    ones = jnp.ones((4,), jnp.float32)
    c = jnp.full((4,), 2, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(model.apply(params, x, t, c, cond_mask=ones)),
        np.asarray(model.apply(params, x, t, c)),
    )


def test_guidance_scale_one_matches_unguided():
    model, params = _model_params()
    sched = linear_schedule(12)
    plain = DiffusionSampler(model, params, sched, (16,))
    guided = DiffusionSampler(model, params, sched, (16,), guidance_scale=1.0)
    classes = jnp.array([0, 2, 4], jnp.int32)
    a = plain.sample(jax.random.key(2), 3, classes)
    b = guided.sample(jax.random.key(2), 3, classes)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_guidance_scale_changes_samples():
    model, params = _model_params()
    sched = linear_schedule(12)
    s1 = DiffusionSampler(model, params, sched, (16,), guidance_scale=1.0)
    s4 = DiffusionSampler(model, params, sched, (16,), guidance_scale=4.0)
    classes = jnp.array([0, 2, 4], jnp.int32)
    a = s1.sample(jax.random.key(3), 3, classes)
    b = s4.sample(jax.random.key(3), 3, classes)
    assert float(jnp.abs(a - b).max()) > 1e-4


def test_train_step_with_cond_dropout():
    cfg = LatentDiffusionConfig(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16,
        num_classes=6, n_steps=12, steps_per_epoch=2, cond_dropout=0.2,
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    vae_params = vae.init(
        {"params": jax.random.key(4)}, jnp.zeros((1, 64, 64, 3)),
        jax.random.key(5), method=FlowerVAE.init_all,
    )["params"]
    state, model, sched = create_latent_diffusion_state(jax.random.key(0), cfg)
    step = make_latent_diffusion_step(model, vae, sched, cfg)
    images = jax.random.uniform(jax.random.key(6), (8, 64, 64, 3))
    labels = jnp.arange(8, dtype=jnp.int32) % 6
    state, loss = step(state, vae_params, sched, images, labels, None,
                       jax.random.key(7))
    assert bool(jnp.isfinite(loss))


# ---- Dual-condition (v3, class+color) CFG: the joint embedding is nulled
# ---- as one unit (models/latent_unet.py cond_mask zeroes the
# ---- MultiConditionEmbedding output), so guidance drops BOTH conditions.

TINY_V3 = TINY | dict(num_colors=4, shared_cond_proj=False)


def _model_params_v3():
    model = ConditionalLatentDenoiser(**TINY_V3)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    return model, params


def test_cond_mask_zero_erases_class_and_color_identity():
    model, params = _model_params_v3()
    x = jax.random.normal(jax.random.key(1), (4, 16))
    t = jnp.full((4,), 3, jnp.int32)
    zeros = jnp.zeros((4,), jnp.float32)
    out_a = model.apply(params, x, t, jnp.full((4,), 1, jnp.int32),
                        jnp.full((4,), 0, jnp.int32), cond_mask=zeros)
    out_b = model.apply(params, x, t, jnp.full((4,), 5, jnp.int32),
                        jnp.full((4,), 3, jnp.int32), cond_mask=zeros)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_guided_sampler_dual_condition():
    """Guided sampling with (class, color) cond tuples: scale 1.0 matches the
    unguided path; a larger scale changes the samples."""
    model, params = _model_params_v3()
    sched = linear_schedule(12)
    classes = jnp.array([0, 2, 4], jnp.int32)
    colors = jnp.array([1, 3, 0], jnp.int32)
    plain = DiffusionSampler(model, params, sched, (16,))
    g1 = DiffusionSampler(model, params, sched, (16,), guidance_scale=1.0)
    g4 = DiffusionSampler(model, params, sched, (16,), guidance_scale=4.0)
    a = plain.sample(jax.random.key(2), 3, classes, colors)
    b = g1.sample(jax.random.key(2), 3, classes, colors)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)
    c = g4.sample(jax.random.key(2), 3, classes, colors)
    assert float(jnp.abs(a - c).max()) > 1e-4


def test_train_step_with_cond_dropout_and_colors():
    cfg = LatentDiffusionConfig(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16,
        num_classes=6, num_colors=4, n_steps=12, steps_per_epoch=2,
        cond_dropout=0.2, shared_cond_proj=False,
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    vae_params = vae.init(
        {"params": jax.random.key(4)}, jnp.zeros((1, 64, 64, 3)),
        jax.random.key(5), method=FlowerVAE.init_all,
    )["params"]
    state, model, sched = create_latent_diffusion_state(jax.random.key(0), cfg)
    step = make_latent_diffusion_step(model, vae, sched, cfg)
    images = jax.random.uniform(jax.random.key(6), (8, 64, 64, 3))
    labels = jnp.arange(8, dtype=jnp.int32) % 6
    colors = jnp.arange(8, dtype=jnp.int32) % 4
    state, loss = step(state, vae_params, sched, images, labels, colors,
                       jax.random.key(7))
    assert bool(jnp.isfinite(loss))
