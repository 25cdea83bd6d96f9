"""Golden tests for the loss zoo vs torch implementations of the reference
formulas (euclidean v1:293-302, KL v1:380-386, center v1:362-378, BCE
v1:1029)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from flowerdiff.losses import (
    bce_loss,
    center_loss,
    discriminator_loss,
    euclidean_distance_loss,
    generator_adv_loss,
    kl_divergence,
    update_centers,
)


def _torch_euclidean(x, y, reduction="mean"):
    sq = (x - y) ** 2
    dist = torch.sqrt(sq.view(x.size(0), -1).sum(dim=1) + 1e-8)
    return {"mean": dist.mean(), "sum": dist.sum(), "none": dist}[reduction]


def test_euclidean_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3, 4, 2)).astype(np.float32)
    y = rng.normal(size=(5, 3, 4, 2)).astype(np.float32)
    for reduction in ("mean", "sum", "none"):
        ours = np.asarray(
            euclidean_distance_loss(jnp.asarray(x), jnp.asarray(y), reduction)
        )
        ref = _torch_euclidean(torch.from_numpy(x), torch.from_numpy(y), reduction)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5)


def test_kl_matches_reference():
    rng = np.random.default_rng(1)
    mu = (rng.normal(size=(8, 16)) * 6).astype(np.float32)  # exercises clamps
    logvar = (rng.normal(size=(8, 16)) * 4).astype(np.float32)
    ours = float(kl_divergence(jnp.asarray(mu), jnp.asarray(logvar)))

    mu_t = torch.clamp(torch.from_numpy(mu), -10, 10)
    lv_t = torch.clamp(torch.from_numpy(logvar), -2, 10)
    kl = -0.5 * torch.sum(1 + lv_t - mu_t.pow(2) - lv_t.exp(), dim=1)
    ref = torch.clamp(kl, 0.0, 100.0).mean() + 1e-4 * torch.sum(mu_t.pow(2))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_center_loss_matches_reference():
    rng = np.random.default_rng(2)
    z = rng.normal(size=(10, 8)).astype(np.float32)
    centers = rng.normal(size=(5, 8)).astype(np.float32)
    labels = rng.integers(0, 5, size=(10,))
    ours = float(
        center_loss(jnp.asarray(z), jnp.asarray(labels), jnp.asarray(centers))
    )
    diff = torch.from_numpy(z) - torch.from_numpy(centers)[torch.from_numpy(labels)]
    ref = torch.sqrt((diff**2).sum(dim=1) + 1e-8).mean()
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_update_centers_matches_reference_loop():
    """Segment-sum EMA must equal the reference's python loop over unique
    labels (v1:369-378), including classes absent from the batch."""
    rng = np.random.default_rng(3)
    z = rng.normal(size=(12, 4)).astype(np.float32)
    centers = rng.normal(size=(6, 4)).astype(np.float32)
    labels = np.array([0, 0, 2, 2, 2, 5, 5, 5, 5, 0, 2, 5])

    ours = np.asarray(
        update_centers(jnp.asarray(centers), jnp.asarray(z), jnp.asarray(labels), 0.9)
    )

    ref = centers.copy()
    for label in np.unique(labels):
        mean = z[labels == label].mean(axis=0)
        ref[label] = 0.9 * ref[label] + 0.1 * mean
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # classes 1, 3, 4 untouched
    np.testing.assert_array_equal(ours[[1, 3, 4]], centers[[1, 3, 4]])


def test_bce_matches_torch_bce_with_logits():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(16,)).astype(np.float32) * 3
    targets = rng.integers(0, 2, size=(16,)).astype(np.float32)
    ours = float(bce_loss(jnp.asarray(logits), jnp.asarray(targets)))
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)
    )
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_gan_losses_composition():
    real = jnp.asarray([2.0, 3.0])
    fake = jnp.asarray([-1.0, -2.0])
    d = float(discriminator_loss(real, fake))
    expected = 0.5 * (
        float(bce_loss(real, jnp.ones(2))) + float(bce_loss(fake, jnp.zeros(2)))
    )
    np.testing.assert_allclose(d, expected, rtol=1e-6)
    g = float(generator_adv_loss(fake))
    np.testing.assert_allclose(g, float(bce_loss(fake, jnp.ones(2))), rtol=1e-6)
