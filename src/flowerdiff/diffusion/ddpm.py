"""DDPM forward/reverse step math and the training loss.

Parity targets (math re-derived, shape-generic instead of the reference's two
separate 2-D/4-D copies):
  - q_sample        (v1:574-578 latent 2-D; v4:148-153 pixel 4-D)
  - p_sample        (v1:580-592; v4:155-168) — ancestral step, sigma^2 = beta_t,
                    no noise at t=0
  - loss            (v1:600-607 euclidean eps-loss; v4:177-183 MSE eps-loss)

`eps_fn(x_t, t, ...)` is any epsilon-prediction callable — the latent MLP-UNet
or the pixel UNet. Everything here is jit/scan/vmap-safe: `t` may be a traced
per-sample vector and the t=0 branch is a `jnp.where` mask, not Python control
flow.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from flowerdiff.diffusion.schedule import DiffusionSchedule


def _bcast(coef: jax.Array, like: jax.Array) -> jax.Array:
    """Broadcast a (B,) coefficient over the trailing dims of `like`."""
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


def q_sample(
    sched: DiffusionSchedule, x0: jax.Array, t: jax.Array, eps: jax.Array
) -> jax.Array:
    """Forward-noising: sqrt(abar_t) x0 + sqrt(1-abar_t) eps (v1:574-578)."""
    abar = _bcast(sched.alpha_bar[t], x0)
    return jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * eps


def clip_eps_for_x0(
    sched: DiffusionSchedule,
    xt: jax.Array,
    t: jax.Array,
    eps_theta: jax.Array,
    clip_x0: float,
) -> jax.Array:
    """Static x0-thresholding (Ho et al. `clip_denoised`, Saharia et al. §2.3):
    clamp the implied x0-estimate to [-clip, clip] and return the equivalent
    epsilon. In z-scored latent space (NormalizedSampler) a clip of a few
    posterior-sigmas is principled; it bounds the compounding exposure-bias
    amplification of the 1000-step ancestral recursion (measured: unclipped
    generated latents reach ~30-40x the data scale at reference training
    depth — the reference, which never clips, has the same failure, hidden
    by its decoder's input LayerNorm)."""
    abar = _bcast(sched.alpha_bar[t], xt)
    x0 = (xt - jnp.sqrt(1.0 - abar) * eps_theta) / jnp.sqrt(abar)
    x0 = jnp.clip(x0, -clip_x0, clip_x0)
    return (xt - jnp.sqrt(abar) * x0) / jnp.sqrt(1.0 - abar)


def p_sample_mean(
    sched: DiffusionSchedule,
    xt: jax.Array,
    t: jax.Array,
    eps_theta: jax.Array,
    clip_x0: float | None = None,
) -> jax.Array:
    """Posterior mean (xt - (1-a_t)/sqrt(1-abar_t) * eps) / sqrt(a_t)
    (v1:586), optionally with x0-thresholding (clip_eps_for_x0)."""
    if clip_x0 is not None:
        eps_theta = clip_eps_for_x0(sched, xt, t, eps_theta, clip_x0)
    alpha = _bcast(sched.alpha[t], xt)
    abar = _bcast(sched.alpha_bar[t], xt)
    return (xt - ((1.0 - alpha) / jnp.sqrt(1.0 - abar)) * eps_theta) / jnp.sqrt(alpha)


def p_sample(
    sched: DiffusionSchedule,
    xt: jax.Array,
    t: jax.Array,
    eps_theta: jax.Array,
    noise: jax.Array,
    clip_x0: float | None = None,
) -> jax.Array:
    """One ancestral reverse step with sigma^2 = beta_t; deterministic at t=0
    (v1:580-592). `t` is a (B,) int vector; `noise` must be standard normal of
    xt's shape (it is masked out where t == 0 so callers can always pass one).
    """
    mean = p_sample_mean(sched, xt, t, eps_theta, clip_x0)
    sigma = jnp.sqrt(_bcast(sched.beta[t], xt))
    keep_noise = _bcast((t > 0).astype(xt.dtype), xt)
    return mean + sigma * noise * keep_noise


def ddpm_eps_loss(
    sched: DiffusionSchedule,
    eps_fn: Callable[..., jax.Array],
    rng: jax.Array,
    x0: jax.Array,
    *cond: jax.Array,
    distance: str = "euclidean",
) -> jax.Array:
    """Uniform-t epsilon-prediction loss (v1:600-607 / v4:177-183).

    distance='euclidean' is the latent pipeline's per-sample L2 distance
    (v1:607 via v1:293-302); distance='mse' is the pixel pipeline's MSE
    (v4:183).
    """
    from flowerdiff.losses.distances import euclidean_distance_loss

    t_key, eps_key = jax.random.split(rng)
    batch = x0.shape[0]
    t = jax.random.randint(t_key, (batch,), 0, sched.n_steps)
    eps = jax.random.normal(eps_key, x0.shape, dtype=x0.dtype)
    xt = q_sample(sched, x0, t, eps)
    eps_theta = eps_fn(xt, t, *cond)
    if distance == "euclidean":
        return euclidean_distance_loss(eps, eps_theta)
    elif distance == "mse":
        return jnp.mean((eps - eps_theta) ** 2)
    raise ValueError(f"unknown distance {distance!r}")
