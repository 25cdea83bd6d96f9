"""KL divergence with the reference's stability clamps (v1:380-386).

mu clamped to [-10, 10], logvar to [-2, 10]; per-sample KL clamped to
[0, 100] before the batch mean; plus a 1e-4 * sum(mu^2) regularizer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    mu = jnp.clip(mu, -10.0, 10.0)
    logvar = jnp.clip(logvar, -2.0, 10.0)
    kl = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    kl = jnp.mean(jnp.clip(kl, 0.0, 100.0))
    mu_reg = 1e-4 * jnp.sum(mu**2)
    return kl + mu_reg
