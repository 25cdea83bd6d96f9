"""x0-thresholding tests (ddpm.clip_eps_for_x0 + sampler clip_x0 plumbing):
the sampling-time stabilization for the 1000-step ancestral recursion (see
NormalizedSampler docstring for the measured failure it prevents)."""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.diffusion import linear_schedule
from flowerdiff.diffusion.api import DiffusionSampler
from flowerdiff.diffusion.ddpm import clip_eps_for_x0, p_sample, q_sample
from flowerdiff.models import ConditionalLatentDenoiser


def test_clip_is_identity_when_not_binding():
    sched = linear_schedule(50)
    x0 = 0.5 * jax.random.normal(jax.random.key(0), (4, 8))
    eps = jax.random.normal(jax.random.key(1), (4, 8))
    t = jnp.array([5, 20, 35, 49], jnp.int32)
    xt = q_sample(sched, x0, t, eps)
    clipped = clip_eps_for_x0(sched, xt, t, eps, clip_x0=100.0)
    np.testing.assert_allclose(np.asarray(clipped), np.asarray(eps),
                               rtol=1e-4, atol=1e-5)


def test_clip_bounds_the_implied_x0():
    sched = linear_schedule(50)
    xt = 5.0 * jax.random.normal(jax.random.key(2), (4, 8))
    t = jnp.full((4,), 40, jnp.int32)
    eps = jnp.zeros((4, 8))  # implied x0 = xt / sqrt(abar) — far out of bounds
    clipped = clip_eps_for_x0(sched, xt, t, eps, clip_x0=2.0)
    abar = sched.alpha_bar[40]
    x0_implied = (xt - jnp.sqrt(1 - abar) * clipped) / jnp.sqrt(abar)
    assert float(jnp.abs(x0_implied).max()) <= 2.0 + 1e-4


def test_p_sample_clip_changes_only_out_of_bounds_steps():
    sched = linear_schedule(50)
    x0 = 0.1 * jax.random.normal(jax.random.key(3), (4, 8))
    eps = jax.random.normal(jax.random.key(4), (4, 8))
    t = jnp.full((4,), 10, jnp.int32)
    xt = q_sample(sched, x0, t, eps)
    noise = jax.random.normal(jax.random.key(5), (4, 8))
    a = p_sample(sched, xt, t, eps, noise)
    b = p_sample(sched, xt, t, eps, noise, clip_x0=50.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_clipped_sampler_is_scale_stable_under_zero_model():
    """The stabilization property itself: with a zero eps-model the UNCLIPPED
    1000-step recursion amplifies pure noise by 1/sqrt(alpha_bar) ~ 157x;
    with clip_x0 the end state stays within a few clip units."""
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=4
    )
    params = model.init(jax.random.key(0), jnp.zeros((1, 16)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    zero = jax.tree.map(jnp.zeros_like, params)
    sched = linear_schedule(1000)
    classes = jnp.zeros((16,), jnp.int32)

    raw = DiffusionSampler(model, zero, sched, (16,))
    clip = DiffusionSampler(model, zero, sched, (16,), clip_x0=3.0)
    x_raw = raw.sample(jax.random.key(1), 16, classes)
    x_clip = clip.sample(jax.random.key(1), 16, classes)
    assert float(jnp.std(x_raw)) > 50.0  # the blow-up is real
    assert float(jnp.std(x_clip)) < 6.0  # and the clip contains it
    assert bool(jnp.isfinite(x_clip).all())
