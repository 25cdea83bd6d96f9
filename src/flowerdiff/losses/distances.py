"""Euclidean-distance loss — the reference's main reconstruction/perceptual/
latent-eps criterion (v1/model_train_test.py:293-302).

Per-sample L2 norm of the flattened difference (NOT elementwise MSE):
    sqrt(sum((x - y)^2) + 1e-8), reduced by mean/sum/none.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def euclidean_distance_loss(
    x: jax.Array, y: jax.Array, reduction: str = "mean"
) -> jax.Array:
    # accumulate in f32 regardless of input dtype (bf16 features would lose
    # the sum's low bits); no-op for f32 inputs
    diff = (x - y).reshape(x.shape[0], -1).astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=1) + 1e-8)
    if reduction == "mean":
        return jnp.mean(dist)
    if reduction == "sum":
        return jnp.sum(dist)
    if reduction == "none":
        return dist
    raise ValueError(f"unknown reduction {reduction!r}")
