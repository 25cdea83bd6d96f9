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
