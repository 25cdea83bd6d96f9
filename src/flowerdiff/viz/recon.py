"""Reconstruction grids (v1:793-820): 8 test images, originals over
reconstructions -> test_vae_reconstruction_epoch_{N}.png."""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import matplotlib.pyplot as plt
import numpy as np


def visualize_reconstructions(
    encode_decode_fn,
    images: jax.Array,
    labels: np.ndarray,
    epoch: int,
    class_names: Sequence[str],
    save_dir: str = "./results",
    rng: Optional[jax.Array] = None,
    n: int = 8,
) -> str:
    """encode_decode_fn(images, rng) -> reconstructions (the jitted
    mu/logvar -> reparameterize -> decode pipeline, v1:801-804)."""
    os.makedirs(save_dir, exist_ok=True)
    rng = jax.random.key(0) if rng is None else rng
    images = images[:n]
    recon = np.asarray(encode_decode_fn(images, rng))
    originals = np.asarray(images)

    fig, axes = plt.subplots(2, n, figsize=(2 * n, 4))
    for i in range(n):
        axes[0, i].imshow(np.clip(originals[i], 0, 1))
        axes[0, i].set_title(f"Original: {class_names[int(labels[i])]}")
        axes[0, i].axis("off")
        axes[1, i].imshow(np.clip(recon[i], 0, 1))
        axes[1, i].set_title("Reconstruction")
        axes[1, i].axis("off")
    plt.tight_layout()
    save_path = os.path.join(save_dir, f"test_vae_reconstruction_epoch_{epoch}.png")
    plt.savefig(save_path)
    plt.close(fig)
    return save_path
