"""GAN losses.

The reference discriminator ends in a Sigmoid and trains with nn.BCELoss
(v1:1002-1003, 1029). A sigmoid+BCE split is numerically fragile; TPU-first we
keep the discriminator's output as LOGITS and use the fused
sigmoid-cross-entropy, which is the same loss with better numerics (documented
deviation — the probability-space clamp torch's BCELoss applies is subsumed by
the log-sum-exp form).

D loss: (BCE(D(real), 1) + BCE(D(fake.detach()), 0)) / 2   (v1:1097-1099)
G adv:  BCE(D(recon), 1)                                   (v1:1105)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean sigmoid binary cross-entropy from logits."""
    # log(1 + exp(-|x|)) + max(x, 0) - x * target  — stable form.
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def discriminator_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """(BCE(real, 1) + BCE(fake, 0)) / 2 (v1:1097-1099)."""
    real_loss = bce_loss(real_logits, jnp.ones_like(real_logits))
    fake_loss = bce_loss(fake_logits, jnp.zeros_like(fake_logits))
    return 0.5 * (real_loss + fake_loss)


def generator_adv_loss(fake_logits: jax.Array) -> jax.Array:
    """BCE(D(recon), 1) (v1:1105)."""
    return bce_loss(fake_logits, jnp.ones_like(fake_logits))
