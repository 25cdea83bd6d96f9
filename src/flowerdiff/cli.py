"""Command-line interface.

The reference's top README documents a CLI (`--total_epochs`,
`--checkpoint_path`, README.md:55-64) that the scripts never implement (no
argparse anywhere — SURVEY.md §5.6). This implements that documented surface
for real, plus the version presets:

    python main.py --version v1 --total_epochs 2000
    python main.py --version v1 --checkpoint_path .../epoch_450
    python main.py --version v4 --total_epochs 300
    python main.py --version v1 --dataset synthetic --total_epochs 2 \
        --vae_epochs 2 --batch_size 16        # offline smoke run
"""
from __future__ import annotations

import argparse
from typing import Optional, Sequence


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="flowerdiff",
        description="TPU-native VAE-GAN + latent-diffusion for Oxford 102 Flowers",
    )
    p.add_argument("--version", default="v1",
                   choices=["v1", "v2", "v3", "v4", "v5", "flagship"],
                   help="reference-version preset (SURVEY.md §2.2); "
                        "'flagship' = v1 width with the measured best "
                        "beyond-reference levers (configs.FLAGSHIP)")
    p.add_argument("--total_epochs", type=int, default=None,
                   help="diffusion training horizon (v1 default 10000, v1:1432)")
    p.add_argument("--checkpoint_path", default=None,
                   help="resume checkpoint; '...epoch_N' stamps the start epoch "
                        "(v1:1352-1363)")
    p.add_argument("--vae_epochs", type=int, default=None,
                   help="VAE-GAN training epochs (default 1200, v1:1318)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--data_root", default="./data")
    p.add_argument("--dataset", default="auto",
                   choices=["auto", "flowers102", "synthetic"])
    p.add_argument("--results_dir", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic_size", type=int, default=512)
    p.add_argument("--mesh_data", type=int, default=None,
                   help="data-parallel axis size (default: all devices)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="model-parallel axis size")
    p.add_argument("--vae_bf16", action="store_true",
                   help="bfloat16 compute for the VAE-GAN stage ONLY "
                        "(params/optimizer f32): 21.7 -> 16.3 ms/step at "
                        "reference b64 (artifacts/mfu_r5_train.json) with "
                        "the diffusion stage numerics untouched")
    p.add_argument("--bf16", action="store_true",
                   help="train with bfloat16 compute (f32 params/optimizer; "
                        "configs.bf16_preset — measured ~1.5x VAE-GAN step)")
    p.add_argument("--tiny", action="store_true",
                   help="shrink all models for smoke runs / CI")
    p.add_argument("--visualize_every", type=int, default=None,
                   help="diffusion visualization cadence (default 50, v1:1375)")
    p.add_argument("--vae_visualize_every", type=int, default=None,
                   help="VAE visualization cadence (default 300, v1:1323)")
    p.add_argument("--cond_dropout", type=float, default=None,
                   help="classifier-free-guidance training: per-sample "
                        "null-condition probability (cond_study best: 0.1)")
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="classifier-free guidance at sampling (cond_study "
                        "best: 3.0; needs a model trained with "
                        "--cond_dropout > 0)")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="per-step EMA of the denoiser weights; sampling "
                        "uses the EMA copy (lever study: "
                        "artifacts/cond_sweep_r3)")
    p.add_argument("--latent_cache", type=int, default=None,
                   help="latent-cache training: pool of K frozen-VAE "
                        "posterior draws per image; epochs become denoiser-"
                        "only (measured ~4x epoch speedup; augment variety "
                        "is K draws per refresh instead of fresh per epoch)")
    p.add_argument("--cache_refresh_epochs", type=int, default=None,
                   help="rebuild the latent cache with fresh augmentation "
                        "draws every R epochs (default 0 = never)")
    p.add_argument("--train_kernel", action="store_true",
                   help="fused Pallas forward+backward train kernel for the "
                        "latent denoiser (kernels/train_step.py; v1/v2 "
                        "variants, single chip)")
    p.add_argument("--sampler", default=None, choices=["ancestral", "ddim"],
                   help="sampling mode for grids/sweeps: ancestral (the "
                        "reference's 1000 steps, default) or ddim")
    p.add_argument("--ddim_steps", type=int, default=None,
                   help="DDIM step count (default 50; used with "
                        "--sampler ddim)")
    p.add_argument("--raw_latents", action="store_true",
                   help="train/sample the latent DDPM on RAW (un-z-scored) "
                        "latents with no x0 thresholding — the reference's "
                        "exact semantics (v1:1247-1285). Required when "
                        "resuming from a torch checkpoint imported with "
                        "tools/import_torch_checkpoint.py, which was trained "
                        "on raw latents")
    p.add_argument("--checkpoint_every", type=int, default=None,
                   help="diffusion checkpoint cadence in epochs (default: "
                        "the visualization cadence, matching the reference's "
                        "per-viz saves v1:1282; raise it for long fused runs "
                        "where a full-state save every 50 epochs dominates "
                        "wall time)")
    p.add_argument("--no-final-sweep", action="store_true",
                   help="skip the final sample-grid/paths/GIF sweep (v1:1406-1429)")
    p.add_argument("--no-cadence-viz", action="store_true",
                   help="train without per-cadence visualization artifacts")
    p.add_argument("--no-fused-epochs", action="store_true",
                   help="dispatch one program per batch instead of one per "
                        "epoch-chunk (train/fused.py); keeps the reference's "
                        "per-epoch best-checkpoint granularity")
    return p


def main(argv: Optional[Sequence[str]] = None) -> None:
    args = build_parser().parse_args(argv)

    import os

    import jax

    if os.environ.get("FLOWERDIFF_PLATFORM"):
        # The axon TPU plugin pre-sets jax_platforms, overriding JAX_PLATFORMS;
        # honor an explicit framework-level platform request (e.g. 'cpu' for
        # smoke runs while the chip is busy).
        jax.config.update("jax_platforms", os.environ["FLOWERDIFF_PLATFORM"])
    # Persistent compilation cache: repeated runs skip XLA compiles.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flowerdiff.configs import bf16_preset, get_preset, tiny_preset
    from flowerdiff.parallel import create_mesh
    from flowerdiff.runner import PipelineRunner

    preset = get_preset(args.version)
    if args.tiny:
        preset = tiny_preset(preset)
    if args.bf16:
        preset = bf16_preset(preset)
    import dataclasses

    if args.vae_bf16 and preset.vae is not None:
        preset = dataclasses.replace(
            preset, vae=dataclasses.replace(
                preset.vae, compute_dtype="bfloat16"
            ),
        )

    if args.visualize_every is not None:
        preset = dataclasses.replace(
            preset, diffusion_visualize_every=args.visualize_every,
            pixel_visualize_every=(
                args.visualize_every if preset.pixel is not None
                else preset.pixel_visualize_every
            ),
        )
    if args.vae_visualize_every is not None:
        preset = dataclasses.replace(
            preset, vae_visualize_every=args.vae_visualize_every
        )
    sampler_flags_given = (
        args.sampler is not None or args.ddim_steps is not None
    )
    if sampler_flags_given and preset.latent is None:
        print(
            f"warning: --sampler/--ddim_steps ignored — preset "
            f"{args.version} has no latent-diffusion stage"
        )
    if sampler_flags_given and preset.latent is not None:
        preset = dataclasses.replace(
            preset, latent=dataclasses.replace(
                preset.latent,
                sampler=(args.sampler if args.sampler is not None
                         else preset.latent.sampler),
                ddim_steps=(args.ddim_steps if args.ddim_steps is not None
                            else preset.latent.ddim_steps),
            ),
        )
    cfg_flags_given = (
        args.cond_dropout is not None or args.guidance_scale is not None
        or args.ema_decay is not None or args.latent_cache is not None
        or args.cache_refresh_epochs is not None or args.train_kernel
    )
    if cfg_flags_given and preset.latent is None:
        print(
            f"warning: --cond_dropout/--guidance_scale/--ema_decay/"
            f"--latent_cache/--train_kernel ignored — "
            f"preset {args.version} has no latent-diffusion stage "
            f"(pixel-space DDPM)"
        )
    if cfg_flags_given and preset.latent is not None:
        preset = dataclasses.replace(
            preset, latent=dataclasses.replace(
                preset.latent,
                cond_dropout=(args.cond_dropout
                              if args.cond_dropout is not None
                              else preset.latent.cond_dropout),
                guidance_scale=(args.guidance_scale
                                if args.guidance_scale is not None
                                else preset.latent.guidance_scale),
                ema_decay=(args.ema_decay
                           if args.ema_decay is not None
                           else preset.latent.ema_decay),
                latent_cache=(args.latent_cache
                              if args.latent_cache is not None
                              else preset.latent.latent_cache),
                cache_refresh_epochs=(
                    args.cache_refresh_epochs
                    if args.cache_refresh_epochs is not None
                    else preset.latent.cache_refresh_epochs),
                train_kernel=(args.train_kernel
                              or preset.latent.train_kernel),
                encode_dtype=("bfloat16" if args.latent_cache
                              else preset.latent.encode_dtype),
            ),
        )
    if args.raw_latents:
        if preset.latent is None:
            print(f"warning: --raw_latents ignored — preset {args.version} "
                  f"has no latent-diffusion stage")
        else:
            preset = dataclasses.replace(
                preset, latent=dataclasses.replace(
                    preset.latent,
                    normalize_latents=False, clip_denoised=None,
                ),
            )
    mesh = create_mesh(data=args.mesh_data, model=args.mesh_model)
    runner = PipelineRunner(
        preset,
        results_dir=args.results_dir,
        data_root=args.data_root,
        dataset=args.dataset,
        seed=args.seed,
        mesh=mesh,
        synthetic_size=args.synthetic_size,
        fused_epochs=not args.no_fused_epochs,
    )
    if preset.pixel is not None:
        runner.run_pixel(epochs=args.total_epochs, batch_size=args.batch_size,
                         cadence_viz=not args.no_cadence_viz)
    else:
        runner.run_latent(
            total_epochs=(
                args.total_epochs if args.total_epochs is not None
                else preset.total_epochs
            ),
            vae_epochs=args.vae_epochs,
            checkpoint_path=args.checkpoint_path,
            batch_size=args.batch_size,
            final_sweep=not args.no_final_sweep,
            cadence_viz=not args.no_cadence_viz,
            checkpoint_every=args.checkpoint_every,
        )


if __name__ == "__main__":
    main()
