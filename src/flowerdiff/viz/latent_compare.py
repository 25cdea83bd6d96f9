"""VAE-reconstruction vs diffusion-generation comparison grid.

Parity target: visualize_latent_comparison (v1:1204-1238) — defined in the
reference with its call site commented out (v1:1271-1272); provided here as a
working part of the suite: three rows per batch of test images — original,
VAE reconstruction, and a diffusion sample of the same class.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from flowerdiff.diffusion.api import DiffusionSampler


def visualize_latent_comparison(
    encode_decode_fn,
    decode_fn,
    sampler: DiffusionSampler,
    images: jax.Array,
    labels: np.ndarray,
    class_names: Sequence[str],
    save_path: str = "./results/latent_comparison.png",
    rng: Optional[jax.Array] = None,
    n: int = 8,
) -> str:
    rng = jax.random.key(0) if rng is None else rng
    recon_rng, sample_rng = jax.random.split(rng)
    images = images[:n]
    labels = np.asarray(labels)[:n]

    recon = np.asarray(encode_decode_fn(images, recon_rng))
    latents = sampler.sample(sample_rng, n, jnp.asarray(labels, jnp.int32))
    generated = np.asarray(decode_fn(latents))

    fig, axes = plt.subplots(3, n, figsize=(2 * n, 6.5))
    rows = [
        (np.asarray(images), "Original"),
        (recon, "VAE recon"),
        (generated, "Diffusion"),
    ]
    for r, (imgs, title) in enumerate(rows):
        for i in range(n):
            axes[r, i].imshow(np.clip(imgs[i], 0, 1))
            axes[r, i].axis("off")
            if r == 0:
                axes[r, i].set_title(class_names[int(labels[i])], fontsize=8)
        axes[r, 0].set_ylabel(title)
    plt.suptitle("Original vs VAE reconstruction vs diffusion generation")
    plt.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    plt.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return save_path
