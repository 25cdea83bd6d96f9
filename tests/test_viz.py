"""Visualization-suite smoke tests: every artifact-producing function runs
end-to-end on tiny fakes and writes its file (the reference's de-facto test
strategy, SURVEY.md §4, turned into actual tests). Uses a lightweight fake
sampler implementing the DiffusionSampler interface."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowerdiff.diffusion import linear_schedule
from flowerdiff.viz import (
    create_diffusion_animation,
    create_flower_color_visualization,
    generate_class_samples,
    generate_class_color_samples,
    generate_samples_grid,
    plot_loss_curves,
    plot_single_loss_curve,
    visualize_denoising_steps,
    visualize_latent_comparison,
    visualize_latent_space,
    visualize_reconstructions,
)
from flowerdiff.viz.grids import generate_pixel_samples_grid

SCHED = linear_schedule(10)
LATENT = 8
NAMES = [str(i) for i in range(12)]


class FakeSampler:
    """DiffusionSampler-compatible stub: deterministic pseudo-samples."""

    def __init__(self, event_shape=(LATENT,)):
        self.sched = SCHED
        self.event_shape = tuple(event_shape)

    @property
    def latent_dim(self):
        return self.event_shape[0]

    def _draw(self, rng, batch):
        return jax.random.normal(rng, (batch,) + self.event_shape) * 0.5

    def sample(self, rng, batch, *cond):
        return self._draw(rng, batch)

    def masked_denoise(self, rng, x_init, t_start, *cond):
        return x_init * 0.1

    def sample_with_trajectory(self, rng, batch, *cond):
        x = self._draw(rng, batch)
        traj = jnp.stack([x * (i + 1) / SCHED.n_steps for i in range(SCHED.n_steps)])
        return x, traj


def decode_fn(z):
    """Fake decoder: (B, LATENT) -> (B, 16, 16, 3) via broadcast."""
    img = jax.nn.sigmoid(z[:, :3])
    return jnp.broadcast_to(img[:, None, None, :], (z.shape[0], 16, 16, 3))


def encode_mu_fn(images):
    return images.reshape(images.shape[0], -1)[:, :LATENT]


def encode_decode_fn(images, rng):
    return images


@pytest.fixture(scope="module")
def fake_images():
    return jax.random.uniform(jax.random.key(0), (40, 16, 16, 3))


@pytest.fixture(scope="module")
def fake_labels():
    return np.arange(40) % 12


def test_samples_grid(tmp_path):
    path = generate_samples_grid(
        FakeSampler(), decode_fn, NAMES,
        n_per_class=2, n_classes_vis=3, save_dir=str(tmp_path),
    )
    assert os.path.exists(path) and path.endswith("vae_samples_grid_subset.png")


def test_class_samples(tmp_path):
    path = str(tmp_path / "strip.png")
    samples = generate_class_samples(
        FakeSampler(), decode_fn, "3", NAMES, num_samples=2, save_path=path,
    )
    assert samples.shape[0] == 2 and os.path.exists(path)


def test_class_color_samples(tmp_path):
    path = str(tmp_path / "strip_color.png")
    samples = generate_class_color_samples(
        FakeSampler(), decode_fn, "3", "purple", NAMES, num_samples=2,
        save_path=path,
    )
    assert samples.shape[0] == 2 and os.path.exists(path)


def test_pixel_grid(tmp_path):
    path = generate_pixel_samples_grid(
        FakeSampler(event_shape=(8, 8, 3)), n_samples=4,
        save_path=str(tmp_path / "samples_grid.png"),
    )
    assert os.path.exists(path)


def test_reconstructions(tmp_path, fake_images, fake_labels):
    path = visualize_reconstructions(
        encode_decode_fn, fake_images, fake_labels, 3, NAMES, str(tmp_path)
    )
    assert path.endswith("test_vae_reconstruction_epoch_3.png")
    assert os.path.exists(path)


def test_latent_space_tsne(tmp_path, fake_images, fake_labels):
    path = visualize_latent_space(
        encode_mu_fn, fake_images, fake_labels, 7, NAMES, str(tmp_path)
    )
    assert path is not None and path.endswith("vae_latent_space_epoch_7.png")


def test_denoising_steps(tmp_path, fake_images, fake_labels):
    path = visualize_denoising_steps(
        encode_mu_fn, decode_fn, FakeSampler(), fake_images, fake_labels,
        class_idx=1, class_names=NAMES,
        save_path=str(tmp_path / "denoise.png"), n_samples=2, steps_to_show=3,
    )
    assert os.path.exists(path)


def test_animation(tmp_path):
    path = create_diffusion_animation(
        FakeSampler(), decode_fn, 2, NAMES, num_frames=4,
        save_path=str(tmp_path / "anim.gif"),
    )
    assert os.path.exists(path)


def test_latent_comparison(tmp_path, fake_images, fake_labels):
    path = visualize_latent_comparison(
        encode_decode_fn, decode_fn, FakeSampler(), fake_images, fake_labels,
        NAMES, save_path=str(tmp_path / "cmp.png"), n=4,
    )
    assert os.path.exists(path)


def test_color_visualization(tmp_path, fake_images, fake_labels):
    path = create_flower_color_visualization(
        np.asarray(fake_images[:6]), fake_labels[:6], NAMES, num_samples=6,
        save_path=str(tmp_path / "color_visualization.png"),
        color_labels=np.arange(6) % 10,
    )
    assert os.path.exists(path)


def test_loss_curves(tmp_path):
    hist = {"total": [3.0, 2.0], "recon": [2.0, 1.5], "kl": [0.1, 0.2]}
    p1 = plot_loss_curves(hist, str(tmp_path / "autoencoder_losses.png"))
    p2 = plot_single_loss_curve([1.0, 0.5], str(tmp_path / "diffusion_loss.png"))
    assert os.path.exists(p1) and os.path.exists(p2)
