"""Latent z-scoring codec tests (diffusion/api.py NormalizedSampler +
LatentDiffusionConfig.normalize_latents): the fix for the generated-latent
scale blow-up the quality metrics caught at reference depth (r2)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowerdiff.diffusion import linear_schedule
from flowerdiff.diffusion.api import DiffusionSampler, NormalizedSampler
from flowerdiff.models import ConditionalLatentDenoiser, FlowerVAE
from flowerdiff.train.latent_ddpm import (
    LatentDiffusionConfig,
    LatentDiffusionTrainer,
    create_latent_diffusion_state,
    make_latent_diffusion_step,
)

TINY = dict(channels=(8, 16, 24, 32), head_width=32)


def _sampler(dim=6, n_steps=8):
    model = ConditionalLatentDenoiser(
        latent_dim=dim, hidden_dims=(8, 16, 8), time_emb_dim=8, num_classes=4
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, dim)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    return DiffusionSampler(model, params, linear_schedule(n_steps), (dim,))


def test_normalized_sampler_denormalizes_outputs():
    inner = _sampler()
    mean = jnp.arange(6, dtype=jnp.float32)
    std = jnp.asarray([1.0, 2.0, 0.5, 3.0, 1.5, 4.0])
    wrapped = NormalizedSampler(inner, mean, std)
    classes = jnp.array([0, 1, 2], jnp.int32)

    raw = inner.sample(jax.random.key(1), 3, classes)
    out = wrapped.sample(jax.random.key(1), 3, classes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(raw * std + mean),
                               rtol=1e-6)

    x = jax.random.normal(jax.random.key(2), (3, 6))
    t = jnp.array([5, 3, 1], jnp.int32)
    raw_m = inner.masked_denoise(jax.random.key(3), x, t, classes)
    out_m = wrapped.masked_denoise(jax.random.key(3), x, t, classes)
    np.testing.assert_allclose(np.asarray(out_m),
                               np.asarray(raw_m * std + mean), rtol=1e-6)

    f_raw, tr_raw = inner.sample_with_trajectory(jax.random.key(4), 2, classes[:2])
    f_out, tr_out = wrapped.sample_with_trajectory(jax.random.key(4), 2, classes[:2])
    np.testing.assert_allclose(np.asarray(f_out),
                               np.asarray(f_raw * std + mean), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tr_out),
                               np.asarray(tr_raw * std + mean), rtol=1e-6)

    # normalize() is the exact inverse of the output map.
    np.testing.assert_allclose(np.asarray(wrapped.normalize(out)),
                               np.asarray(raw), rtol=1e-5, atol=1e-6)


def test_identity_stats_match_unnormalized_step():
    """With mean=0, std=1 the z-scored train step is bitwise the plain one."""
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 32, 16), time_emb_dim=8,
        num_classes=5, n_steps=20, steps_per_epoch=2,
    )
    rng = jax.random.key(3)
    vae = FlowerVAE(latent_dim=8, num_classes=5, **TINY)
    vae_params = vae.init(
        {"params": jax.random.key(4)}, jnp.zeros((1, 64, 64, 3)),
        jax.random.key(5), method=FlowerVAE.init_all,
    )["params"]
    images = jax.random.uniform(jax.random.key(6), (4, 64, 64, 3))
    labels = jnp.array([0, 1, 2, 3], jnp.int32)

    state, model, sched = create_latent_diffusion_state(rng, cfg)
    step = make_latent_diffusion_step(model, vae, sched, cfg)
    state2 = jax.tree.map(jnp.copy, state)

    _, loss_plain = step(state, vae_params, sched, images, labels, None,
                         jax.random.key(9))
    ident = (jnp.zeros(8), jnp.ones(8))
    _, loss_ident = step(state2, vae_params, sched, images, labels, None,
                         jax.random.key(9), ident)
    assert float(loss_plain) == float(loss_ident)


def test_trainer_requires_stats_when_normalizing():
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 32, 16), time_emb_dim=8,
        num_classes=5, n_steps=20, normalize_latents=True,
    )
    vae = FlowerVAE(latent_dim=8, num_classes=5, **TINY)
    with pytest.raises(ValueError):
        LatentDiffusionTrainer(cfg, vae, jax.random.key(0))
    stats = (jnp.zeros(8), jnp.ones(8))
    tr = LatentDiffusionTrainer(cfg, vae, jax.random.key(0), latent_stats=stats)
    assert isinstance(tr.sampler(), NormalizedSampler)
