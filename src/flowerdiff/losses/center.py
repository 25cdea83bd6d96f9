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


def standalone_center_loss(
    z: jax.Array,
    labels: jax.Array,
    centers: jax.Array,
    min_distance: float = 1.0,
    repulsion_strength: float = 1.0,
) -> jax.Array:
    """The reference's standalone CenterLoss module semantics (v1:84-141):
    attraction to learned centers + center-repulsion hinge(min_distance) -
    0.1 * mean intra-class variance.

    NOTE: this variant is DEAD CODE in the reference — training actually uses
    `compute_center_loss` (v1:1094), i.e. `center_loss` above. It is provided
    for API parity only (SURVEY.md §2.1). Vectorized: the reference's python
    loop over classes (v1:125-131) becomes segment ops.
    """
    num_classes = centers.shape[0]
    batch = z.shape[0]

    # Pairwise distances z<->centers (v1:102-110, clamp 1e-12 then sqrt).
    d2 = (
        jnp.sum(z**2, axis=1)[:, None]
        + jnp.sum(centers**2, axis=1)[None, :]
        - 2.0 * z @ centers.T
    )
    dist = jnp.sqrt(jnp.clip(d2, min=1e-12))
    attraction = jnp.sum(dist[jnp.arange(batch), labels]) / batch

    cd2 = (
        jnp.sum(centers**2, axis=1)[:, None]
        + jnp.sum(centers**2, axis=1)[None, :]
        - 2.0 * centers @ centers.T
    )
    center_dist = jnp.sqrt(jnp.clip(cd2, min=1e-12))
    off_diag = 1.0 - jnp.eye(num_classes)
    repulsion = jnp.sum(
        jnp.clip(min_distance - center_dist, min=0.0) * off_diag
    ) / (num_classes * (num_classes - 1) + 1e-6)

    # Intra-class variance via segment sums (classes with >1 sample only).
    counts = jax.ops.segment_sum(jnp.ones((batch,)), labels, num_classes)
    sums = jax.ops.segment_sum(z, labels, num_classes)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    sq_dev = jnp.sum((z - means[labels]) ** 2, axis=1)
    var_sums = jax.ops.segment_sum(sq_dev, labels, num_classes)
    cls_var = jnp.where(counts > 1, var_sums / jnp.maximum(counts, 1.0), 0.0)
    intra_variance = jnp.sum(cls_var) / num_classes

    return attraction + repulsion_strength * repulsion - 0.1 * intra_variance


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
