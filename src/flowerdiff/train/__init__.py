"""Training loops and optimization (reference layer L5, SURVEY.md §1)."""
from flowerdiff.train.schedules import (
    onecycle_schedule,
    cosine_warm_restarts_schedule,
    vae_gan_loss_gates,
)
from flowerdiff.train.vae_gan import VAEGANConfig, VAEGANTrainer
from flowerdiff.train.latent_ddpm import LatentDiffusionConfig, LatentDiffusionTrainer
from flowerdiff.train.pixel_ddpm import PixelDiffusionConfig, PixelDiffusionTrainer

__all__ = [
    "onecycle_schedule",
    "cosine_warm_restarts_schedule",
    "vae_gan_loss_gates",
    "VAEGANConfig",
    "VAEGANTrainer",
    "LatentDiffusionConfig",
    "LatentDiffusionTrainer",
    "PixelDiffusionConfig",
    "PixelDiffusionTrainer",
]
