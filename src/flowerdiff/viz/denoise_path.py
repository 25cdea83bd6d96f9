"""Denoising-path visualization.

Parity target: visualize_denoising_steps (v1:657-791): PCA(2) fit on all
test-split mu latents; 5 samples denoised from each of 8 evenly spaced start
timesteps; image grid on top, 2-D PCA path of sample 0 with arrows /
start-end markers / target-class centroid below; 300 dpi PNG.

TPU-first: the reference runs nested python loops — about 4500 sequential
p_sample calls (v1:686-694). Here all (8 start-timesteps x 5 samples) = 40
chains run as ONE batch through ONE 1000-step lax.scan with a per-chain
start-time mask: chain j only begins updating once the scanned t drops to
its t_start. 1000 fused steps total, and every step's epsilon evaluation is
a single batched matmul stack.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from flowerdiff.diffusion.api import DiffusionSampler
from flowerdiff.viz.latent_plots import encode_split, pca_projection


def visualize_denoising_steps(
    encode_mu_fn,
    decode_fn,
    sampler: DiffusionSampler,
    test_images: jax.Array,
    test_labels: np.ndarray,
    class_idx: int,
    class_names: Sequence[str],
    save_path: Optional[str] = None,
    rng: Optional[jax.Array] = None,
    n_samples: int = 5,
    steps_to_show: int = 8,
    extra_cond: Optional[jax.Array] = None,
) -> str:
    rng = jax.random.key(0) if rng is None else rng
    init_rng, scan_rng = jax.random.split(rng)
    sched = sampler.sched
    latent_dim = sampler.latent_dim

    # Host/sklearn projection of the full test split (v1:663-677).
    all_latents = encode_split(encode_mu_fn, test_images)
    all_labels = np.asarray(test_labels)
    latents_2d, pca = pca_projection(all_latents)

    # Start timesteps, descending (v1:680-681).
    step_size = sched.n_steps // steps_to_show
    timesteps = list(range(0, sched.n_steps, step_size))[::-1]

    # One batched masked scan for all chains (the same 5 noise draws are the
    # start point for every start-timestep, mirroring v1:683,688).
    x = jax.random.normal(init_rng, (n_samples, latent_dim))
    x_tiled = jnp.tile(x, (len(timesteps), 1))  # (8*5, D)
    t_start = jnp.repeat(jnp.asarray(timesteps, jnp.int32), n_samples)
    classes = jnp.full((len(timesteps) * n_samples,), class_idx, jnp.int32)
    cond = (classes,) if extra_cond is None else (classes, extra_cond)
    final = sampler.masked_denoise(scan_rng, x_tiled, t_start, *cond)
    decoded = np.asarray(decode_fn(final)).reshape(
        len(timesteps), n_samples, *np.asarray(decode_fn(final[:1])).shape[1:]
    )

    # Path of chain 0 per start-timestep (+ duplicated endpoint, v1:694).
    path_latents = np.asarray(final).reshape(len(timesteps), n_samples, -1)[:, 0, :]
    path_latents = np.vstack([path_latents, path_latents[-1:]])
    path_2d = pca.transform(path_latents)

    # ---- Figure (layout mirrors v1:697-783). ----
    fig = plt.figure(figsize=(16, 16))
    gs = plt.GridSpec(2, 1, height_ratios=[1.5, 1], hspace=0.3)
    ax_top = fig.add_subplot(gs[0])
    ax_top.set_title(
        f"VAE-Diffusion Denoising Process for {class_names[class_idx]}",
        fontsize=16, pad=10,
    )
    ax_top.set_xticks([])
    ax_top.set_yticks([])
    sub = gs[0].subgridspec(n_samples, len(timesteps), wspace=0.1, hspace=0.1)
    for i in range(n_samples):
        for j, t in enumerate(timesteps):
            ax = fig.add_subplot(sub[i, j])
            ax.imshow(np.clip(decoded[j, i], 0, 1))
            if i == 0:
                ax.set_title(f"t={t}", fontsize=9)
                for spine in ax.spines.values():
                    spine.set_color("red")
                    spine.set_linewidth(2)
            if j == 0:
                ax.set_ylabel(f"Sample {i + 1}", fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
    plt.figtext(0.02, 0.65, "Path Tracked →", fontsize=12, color="red",
                bbox=dict(facecolor="white", alpha=0.7, edgecolor="red"))

    ax_lat = fig.add_subplot(gs[1])
    for i in range(min(10, len(class_names))):
        mask = all_labels == i
        ax_lat.scatter(
            latents_2d[mask, 0], latents_2d[mask, 1], label=class_names[i],
            alpha=0.8 if i == class_idx else 0.3,
            s=40 if i == class_idx else 20,
        )
    ax_lat.plot(path_2d[:, 0], path_2d[:, 1], "r-o", linewidth=2.5,
                markersize=8, label="Diffusion Path", zorder=10)
    for i in range(len(path_2d) - 1):
        ax_lat.annotate(
            "", xy=tuple(path_2d[i + 1]), xytext=tuple(path_2d[i]),
            arrowprops=dict(arrowstyle="->", color="darkred", lw=1.5),
        )
    for i, t in enumerate(timesteps):
        ax_lat.annotate(f"t={t}", xy=tuple(path_2d[i]),
                        xytext=(path_2d[i, 0] + 2, path_2d[i, 1] + 2),
                        fontsize=8, color="darkred")
    ax_lat.scatter(*path_2d[0], c="black", s=100, marker="x",
                   label="Start (Noise)", zorder=11)
    ax_lat.scatter(*path_2d[-1], c="green", s=100, marker="*",
                   label="End (Generated)", zorder=11)
    target_mask = all_labels == class_idx
    if target_mask.any():
        center = latents_2d[target_mask].mean(axis=0)
        ax_lat.scatter(*center, c="green", s=300, marker="*",
                       edgecolor="black", alpha=0.7, zorder=9)
        ax_lat.annotate(
            f"TARGET: {class_names[class_idx]}", xy=tuple(center),
            xytext=(center[0] + 5, center[1] + 5), fontsize=14,
            fontweight="bold", color="darkgreen",
            bbox=dict(boxstyle="round,pad=0.5", facecolor="white", alpha=0.8),
        )
    ax_lat.set_title(
        f"VAE-Diffusion Path in Latent Space for {class_names[class_idx]}",
        fontsize=16,
    )
    ax_lat.legend(fontsize=10, loc="best")
    ax_lat.grid(True, linestyle="--", alpha=0.7)
    plt.figtext(
        0.5, 0.01,
        "Denoising process (top) and the corresponding path in latent space "
        "(bottom).\nThe first row (highlighted in red) corresponds to the "
        "latent-space path.",
        ha="center", fontsize=12,
        bbox=dict(boxstyle="round", facecolor="white", alpha=0.8),
    )
    fig.subplots_adjust(left=0.05, right=0.95, top=0.95, bottom=0.05)
    if save_path is None:
        save_path = f"./results/denoising_path_{class_names[class_idx]}.png"
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    plt.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return save_path
