"""Image metrics/helpers.

The reference publishes no quantitative metric (SURVEY.md §6); PSNR is the
BASELINE.md reconstruction-quality metric for the rebuild.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(x: jax.Array, y: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Peak signal-to-noise ratio in dB over the whole batch."""
    mse = jnp.mean((x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def to_uint8(img) -> np.ndarray:
    return np.uint8(255 * np.clip(np.asarray(img), 0, 1))


def normalize_latents(z: jax.Array, eps: float = 1e-8):
    """Z-score latents over the batch, returning (z_norm, mean, std).

    Parity target: check_and_normalize_latent (v1:1195-1201) — dead code in
    the reference, kept as a utility (SURVEY.md §2.1). std uses ddof=1 like
    torch.std."""
    mean = jnp.mean(z, axis=0, keepdims=True)
    std = jnp.std(z, axis=0, keepdims=True, ddof=1)
    return (z - mean) / (std + eps), mean, std
