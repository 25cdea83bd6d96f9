"""Version presets v1..v5 mirroring the reference's five scripts
(SURVEY.md §2.2 capability matrix; BASELINE.json configs).

  v1: VAE-GAN + class-conditional latent DDPM           (v1/model_train_test.py)
  v2: v1 + learned global UNet skip                      (v2:561)
  v3: v1 + separate condition projections + color cond   (v3:739-853)
  v4: pixel-space DDPM baseline                          (v4:37-199)
  v5: v4 + learnable output residual + train-time viz    (v5:54,144,268-273)
"""
from __future__ import annotations

import dataclasses
from typing import Optional

from flowerdiff.train.latent_ddpm import LatentDiffusionConfig
from flowerdiff.train.pixel_ddpm import PixelDiffusionConfig
from flowerdiff.train.vae_gan import VAEGANConfig


@dataclasses.dataclass(frozen=True)
class VersionPreset:
    name: str
    img_size: int = 64
    batch_size: int = 64  # v1:37
    # latent pipeline (None for v4/v5)
    vae: Optional[VAEGANConfig] = None
    latent: Optional[LatentDiffusionConfig] = None
    vae_epochs: int = 1200  # v1:1318 (v3: 2000, v3:1623)
    total_epochs: int = 10_000  # v1:1432
    vae_visualize_every: int = 300  # v1:1323
    diffusion_visualize_every: int = 50  # v1:1375
    # pixel pipeline (None for v1..v3)
    pixel: Optional[PixelDiffusionConfig] = None
    pixel_epochs: int = 300  # v4:269
    pixel_visualize_every: Optional[int] = None  # v5: every 10 (v5:268)


def _latent_cfg(**kw) -> LatentDiffusionConfig:
    # All latent presets train the DDPM in z-scored latent space (the
    # reference's intended-but-dead check_and_normalize_latent,
    # v1:1195-1201) and sample with x0-thresholding at 3 posterior-sigmas —
    # both measured to fix the generated-latent scale blow-up the quality
    # metrics caught (see diffusion/api.py NormalizedSampler and
    # ddpm.clip_eps_for_x0).
    kw.setdefault("normalize_latents", True)
    kw.setdefault("clip_denoised", 3.0)
    return LatentDiffusionConfig(**kw)


V1 = VersionPreset(
    name="v1",
    vae=VAEGANConfig(lambda_cls=0.3, lambda_center=0.1, lambda_vgg=0.4),
    latent=_latent_cfg(shared_cond_proj=True, global_skip=False),
)

V2 = VersionPreset(
    name="v2",
    vae=VAEGANConfig(lambda_cls=0.3, lambda_center=0.1, lambda_vgg=0.4),
    latent=_latent_cfg(shared_cond_proj=True, global_skip=True),
)

V3 = VersionPreset(
    name="v3",
    vae=VAEGANConfig(lambda_cls=0.3, lambda_center=0.1, lambda_vgg=0.4),
    latent=_latent_cfg(shared_cond_proj=False, global_skip=False, num_colors=10),
    vae_epochs=2000,
)

V4 = VersionPreset(name="v4", vae=None, latent=None,
                   pixel=PixelDiffusionConfig(learnable_residual=False))

V5 = VersionPreset(name="v5", vae=None, latent=None,
                   pixel=PixelDiffusionConfig(learnable_residual=True),
                   pixel_visualize_every=10)

# The measured best-quality configuration (beyond-reference levers ON):
# v1 width with CFG training, per-step weight EMA, latent-cache training
# (4.2x epoch), the 30k-epoch horizon the cache makes ~5 minutes of chip
# time, and the FD-aware guidance operating point g=7.0 — the knee of the
# round-4 sweep (artifacts/flagship_r4/guidance_eval.json): acc102 0.848
# at the sweep-BEST held-out MMD (0.1124) and FD within 15% of its
# minimum; g=9 buys +0.03 accuracy for +10% MMD / +37% FD, g>=12 buys
# nothing (accuracy saturates ~0.88) while FD runs away 2-4x. Ancestral
# beats DDIM-50 on accuracy and MMD below g=12 at this checkpoint.
FLAGSHIP = VersionPreset(
    name="flagship",
    vae=VAEGANConfig(lambda_cls=0.3, lambda_center=0.1, lambda_vgg=0.4),
    latent=_latent_cfg(
        shared_cond_proj=True, global_skip=False,
        cond_dropout=0.1, ema_decay=0.999, guidance_scale=7.0,
        latent_cache=8, cache_refresh_epochs=50,
        encode_dtype="bfloat16",
    ),
    total_epochs=30_000,
)

PRESETS = {p.name: p for p in (V1, V2, V3, V4, V5, FLAGSHIP)}


def get_preset(name: str) -> VersionPreset:
    try:
        return PRESETS[name]
    except KeyError:
        raise ValueError(f"unknown version {name!r}; choose from {sorted(PRESETS)}")


def bf16_preset(preset: VersionPreset) -> VersionPreset:
    """Mixed-precision variant: conv/dense stacks compute in bfloat16,
    params and optimizer state stay f32 (train/*.py compute_dtype). Measured
    on v5e: VAE-GAN full-objective step 25.2 -> 16.6 ms (BASELINE.md); the
    HBM-bound G+D double-backward is where the traffic saving lands."""
    rep = {}
    for field in ("vae", "latent", "pixel"):
        cfg = getattr(preset, field)
        if cfg is not None:
            rep[field] = dataclasses.replace(cfg, compute_dtype="bfloat16")
    return dataclasses.replace(preset, **rep)


def tiny_preset(preset: VersionPreset) -> VersionPreset:
    """Shrink every model in a preset for smoke runs / CI (reference
    capability shapes preserved, widths reduced)."""
    vae = latent = pixel = None
    if preset.vae is not None:
        vae = dataclasses.replace(
            preset.vae, latent_dim=32, channels=(8, 16, 24, 32), head_width=32,
            use_perceptual=False,
        )
    if preset.latent is not None:
        latent = dataclasses.replace(
            preset.latent, latent_dim=32, hidden_dims=(32, 64, 32),
            time_emb_dim=32, n_steps=50,
        )
    if preset.pixel is not None:
        pixel = dataclasses.replace(
            preset.pixel, base_channels=8, time_emb_dim=16, n_steps=50
        )
    return dataclasses.replace(
        preset, vae=vae, latent=latent, pixel=pixel, batch_size=8,
        vae_epochs=1, total_epochs=1, pixel_epochs=1,
        vae_visualize_every=1, diffusion_visualize_every=1,
    )
