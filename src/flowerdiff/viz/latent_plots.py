"""Latent-space projections.

Parity targets:
  - visualize_latent_space (v1:822-854): t-SNE(perplexity 40, 1000 iters,
    seed 42) of all test-split mu's, scatter of the first 10 classes ->
    vae_latent_space_epoch_{N}.png, with the reference's try/except guard.
  - the batched test-split encode both it and the denoising-path figure share
    (v1:663-674): encode on device in large batches, ONE device->host gather.

t-SNE/PCA stay on host (sklearn) by design — SURVEY.md §7.3(6).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np


def encode_split(
    encode_mu_fn, images: jax.Array, batch_size: int = 500
) -> np.ndarray:
    """Encode a whole split to mu latents in device batches; single host
    gather at the end (v1:663-674 used batch-500 loaders)."""
    chunks = []
    n = images.shape[0]
    for start in range(0, n, batch_size):
        chunks.append(encode_mu_fn(images[start:start + batch_size]))
    return np.concatenate([np.asarray(c) for c in chunks], axis=0)


def visualize_latent_space(
    encode_mu_fn,
    images: jax.Array,
    labels: np.ndarray,
    epoch: int,
    class_names: Sequence[str],
    save_dir: str = "./results",
    max_points: Optional[int] = None,
) -> Optional[str]:
    os.makedirs(save_dir, exist_ok=True)
    latents = encode_split(encode_mu_fn, images)
    labels = np.asarray(labels)
    if max_points is not None and latents.shape[0] > max_points:
        latents, labels = latents[:max_points], labels[:max_points]
    try:
        from sklearn.manifold import TSNE

        perplexity = min(40, max(2, latents.shape[0] // 4))
        tsne = TSNE(
            n_components=2, random_state=42, perplexity=perplexity, max_iter=1000
        )
        latents_2d = tsne.fit_transform(latents)
        plt.figure(figsize=(10, 8))
        for i in range(min(10, len(class_names))):
            mask = labels == i
            plt.scatter(
                latents_2d[mask, 0], latents_2d[mask, 1],
                label=class_names[i], alpha=0.6,
            )
        plt.title(f"t-SNE Visualization of VAE Latent Space (Epoch {epoch})")
        plt.legend()
        plt.grid(True, linestyle="--", alpha=0.7)
        plt.tight_layout()
        save_path = os.path.join(save_dir, f"vae_latent_space_epoch_{epoch}.png")
        plt.savefig(save_path)
        plt.close()
        return save_path
    except Exception as exc:  # noqa: BLE001 — parity with v1:852-853
        print(f"t-SNE visualization error: {exc}")
        return None


def pca_projection(latents: np.ndarray) -> Tuple[np.ndarray, object]:
    """PCA(2, seed 42) fit (v1:676-677); returns (projected, fitted pca)."""
    from sklearn.decomposition import PCA

    pca = PCA(n_components=2, random_state=42)
    return pca.fit_transform(latents), pca
