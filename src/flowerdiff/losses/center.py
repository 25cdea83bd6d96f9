"""EMA class-center loss.

Parity targets:
  - SimpleAutoencoder.compute_center_loss (v1:362-367): per-sample euclidean
    distance to the EMA center of the sample's class, batch-meaned.
  - SimpleAutoencoder.update_centers (v1:369-378): EMA (momentum 0.9) of the
    per-class batch means, only for classes present in the batch.

The reference updates centers with a Python loop over unique labels; here the
update is a single `jax.ops.segment_sum` pair — one pass, jit/pjit-safe, and
under data parallelism the segment sums reduce over the global batch via the
mesh's all-reduce (centers are replicated state).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def center_loss(z: jax.Array, labels: jax.Array, centers: jax.Array) -> jax.Array:
    """Mean euclidean distance from z_i to centers[labels_i] (v1:362-367)."""
    delta = z - centers[labels]
    return jnp.mean(jnp.sqrt(jnp.sum(delta * delta, axis=1) + 1e-8))


def update_centers(
    centers: jax.Array, z: jax.Array, labels: jax.Array, momentum: float = 0.9
) -> jax.Array:
    """EMA update of per-class centers from the batch (v1:369-378), as
    segment ops: classes absent from the batch keep their old centers."""
    num_classes = centers.shape[0]
    sums = jax.ops.segment_sum(z, labels, num_segments=num_classes)
    counts = jax.ops.segment_sum(
        jnp.ones((z.shape[0],), z.dtype), labels, num_segments=num_classes
    )
    present = counts > 0
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    updated = momentum * centers + (1.0 - momentum) * means
    return jnp.where(present[:, None], updated, centers)
