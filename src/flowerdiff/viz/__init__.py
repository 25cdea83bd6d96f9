"""Visualization/eval suite (reference layer L6, SURVEY.md §1).

The reference's visualizations are its de-facto test suite (SURVEY.md §4);
artifact names match §7.4 so downstream tooling finds identical files. Every
figure's device work is batched into at most one jitted sampling call —
e.g. the 10x5 sample grid is ONE batch of 50 latents through one scan,
not 10 sequential per-class loops (v1:625-633).
"""
import matplotlib

matplotlib.use("Agg")  # headless backend before pyplot import

from flowerdiff.viz.grids import generate_samples_grid, generate_class_samples
from flowerdiff.viz.recon import visualize_reconstructions
from flowerdiff.viz.latent_plots import visualize_latent_space, encode_split
from flowerdiff.viz.denoise_path import visualize_denoising_steps
from flowerdiff.viz.animation import create_diffusion_animation
from flowerdiff.viz.curves import plot_loss_curves, plot_single_loss_curve
from flowerdiff.viz.latent_compare import visualize_latent_comparison
from flowerdiff.viz.color_viz import (
    create_flower_color_visualization,
    generate_class_color_samples,
)

__all__ = [
    "generate_samples_grid",
    "generate_class_samples",
    "visualize_reconstructions",
    "visualize_latent_space",
    "encode_split",
    "visualize_denoising_steps",
    "create_diffusion_animation",
    "plot_loss_curves",
    "plot_single_loss_curve",
    "visualize_latent_comparison",
    "create_flower_color_visualization",
    "generate_class_color_samples",
]
