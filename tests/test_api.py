"""DiffusionSampler facade tests: params-as-arguments jitting, program-cache
reuse across instances (fresh params must NOT retrigger compilation), and
equivalence with the raw sampler functions."""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.diffusion import linear_schedule, sample
from flowerdiff.diffusion.api import DiffusionSampler, _compiled
from flowerdiff.models import ConditionalLatentDenoiser


def _make(seed=0):
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=5
    )
    params = model.init(
        jax.random.key(seed), jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    sched = linear_schedule(8)
    return model, params, sched


def test_sampler_matches_raw_sample():
    model, params, sched = _make()
    sampler = DiffusionSampler(model, params, sched, (16,))
    c = jnp.arange(4) % 5
    out = sampler.sample(jax.random.key(3), 4, c)

    def eps_fn(x, t, cc):
        return model.apply(params, x, t, cc)

    expected = sample(sched, eps_fn, jax.random.key(3), (4, 16), c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_sampler_program_cache_shared_across_instances():
    model, params, sched = _make()
    a = DiffusionSampler(model, params, sched, (16,))
    _, params2, _ = _make(seed=1)
    b = DiffusionSampler(model, params2, sched, (16,))
    # same compiled programs (lru-cached on model/schedule-spec/shape)
    assert a._sample_jit is b._sample_jit
    assert a._masked_jit is b._masked_jit
    # and different params give different outputs through the same program
    c = jnp.zeros((2,), jnp.int32)
    out_a = a.sample(jax.random.key(0), 2, c)
    out_b = b.sample(jax.random.key(0), 2, c)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_masked_denoise_t0_only_updates_active_chains():
    model, params, sched = _make()
    sampler = DiffusionSampler(model, params, sched, (16,))
    x = jnp.ones((4, 16))
    # chains 0,1 start at t=7 (full denoise); chains 2,3 at t=0 (one step)
    t_start = jnp.array([7, 7, 0, 0], jnp.int32)
    c = jnp.zeros((4,), jnp.int32)
    out = sampler.masked_denoise(jax.random.key(0), x, t_start, c)
    assert out.shape == (4, 16) and bool(jnp.isfinite(out).all())
    # the t=0 chains took exactly one deterministic step from x
    assert not np.allclose(np.asarray(out[2]), np.asarray(x[2]))


def test_sample_from_endpoint():
    model, params, sched = _make()
    sampler = DiffusionSampler(model, params, sched, (16,))
    x = jnp.ones((2, 16))
    out = sampler.sample_from(jax.random.key(1), x, 3, jnp.zeros((2,), jnp.int32))
    assert out.shape == (2, 16) and bool(jnp.isfinite(out).all())


def test_trajectory_and_ddim():
    model, params, sched = _make()
    sampler = DiffusionSampler(model, params, sched, (16,))
    c = jnp.zeros((2,), jnp.int32)
    x, traj = sampler.sample_with_trajectory(jax.random.key(0), 2, c)
    assert traj.shape == (sched.n_steps, 2, 16)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(x), atol=1e-6)
    out = sampler.ddim(jax.random.key(0), 2, c, num_steps=4)
    assert out.shape == (2, 16)


def test_eps_single_eval():
    model, params, sched = _make()
    sampler = DiffusionSampler(model, params, sched, (16,))
    out = sampler.eps(jnp.zeros((2, 16)), jnp.array([0, 5]),
                      jnp.zeros((2,), jnp.int32))
    expected = model.apply(params, jnp.zeros((2, 16)), jnp.array([0, 5]),
                           jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


def test_ddim_sampler_view_routes_sample():
    """DDIMSampler: .sample == inner .ddim at the configured step count;
    other entry points delegate (trajectory viz stays ancestral)."""
    from flowerdiff.diffusion.api import DDIMSampler, DiffusionSampler
    from flowerdiff.models import ConditionalLatentDenoiser

    model = ConditionalLatentDenoiser(
        latent_dim=8, hidden_dims=(8, 16, 8), time_emb_dim=8, num_classes=4
    )
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 8)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    sched = linear_schedule(16)
    inner = DiffusionSampler(model, params, sched, (8,))
    view = DDIMSampler(inner, num_steps=4)
    classes = jnp.zeros((2,), jnp.int32)
    out = view.sample(jax.random.key(1), 2, classes)
    want = inner.ddim(jax.random.key(1), 2, classes, num_steps=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))
    # delegation: trajectory still ancestral, latent_dim passes through
    assert view.latent_dim == 8
    final, traj = view.sample_with_trajectory(jax.random.key(2), 2, classes)
    assert traj.shape[0] == 16


def test_trainer_sampler_ddim_preset():
    from flowerdiff.models import FlowerVAE
    from flowerdiff.train.latent_ddpm import (
        LatentDiffusionConfig,
        LatentDiffusionTrainer,
    )
    from flowerdiff.train.vae_gan import VAEGANConfig, create_vae_gan_state

    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(8, 16, 8), time_emb_dim=8, num_classes=4,
        n_steps=16, sampler="ddim", ddim_steps=4,
    )
    vcfg = VAEGANConfig(latent_dim=8, channels=(8, 16, 24, 32), head_width=32,
                        num_classes=4, use_perceptual=False, total_steps=4)
    _, vae, _ = create_vae_gan_state(jax.random.key(1), vcfg)
    trainer = LatentDiffusionTrainer(cfg, vae, jax.random.key(0))
    s = trainer.sampler()
    from flowerdiff.diffusion.api import DDIMSampler

    assert isinstance(s, DDIMSampler) and s.num_steps == 4
    lat = s.sample(jax.random.key(2), 2, jnp.zeros((2,), jnp.int32))
    assert lat.shape == (2, 8) and bool(jnp.isfinite(lat).all())
