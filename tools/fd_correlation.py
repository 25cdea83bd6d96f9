#!/usr/bin/env python
"""Substitute-backbone FD validation (VERDICT r4 item 8).

The shipped perceptual backbone is the validated substitute (models/vgg.py:
no egress for real ImageNet VGG16 weights). This study measures how well
its Fréchet distance AGREES with backbone-free distribution metrics across
checkpoints of varying quality, shrinking the "different backbone" asterisk
to "backbone with measured agreement":

  For each checkpoint (cadence steps of one run, or several run dirs):
    - generate one fixed batch of class-conditional samples (fixed seed)
    - substitute-FD  : Fréchet in the substitute's relu3_3 pooled space
    - pixel-FD       : Fréchet over 16x16x3 downsampled raw pixels
                       (backbone-free image-space reference)
    - latent MMD     : kernel MMD in the VAE posterior space (independent
                       of the perceptual backbone)
  Reports Spearman rank correlation of substitute-FD against both.

Usage:
  python tools/fd_correlation.py --results_dir RUN [--steps 500,1000,...]
      [--json artifacts/perceptual_ab/fd_correlation.json]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def spearman(a, b) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra ** 2).sum() * (rb ** 2).sum())
    return float((ra * rb).sum() / denom) if denom else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_dir", required=True)
    ap.add_argument("--version", default="v1")
    ap.add_argument("--synthetic_size", type=int, default=1020)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cond_dropout", type=float, default=None)
    ap.add_argument("--ema_decay", type=float, default=None)
    ap.add_argument("--guidance_scale", type=float, default=None)
    ap.add_argument("--latent_cache", type=int, default=None)
    ap.add_argument("--steps", default=None,
                    help="comma-separated checkpoint steps (default: every "
                         "saved step)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from flowerdiff.configs import get_preset, tiny_preset
    from flowerdiff.diffusion.api import DiffusionSampler, NormalizedSampler
    from flowerdiff.models.vae import FlowerVAE
    from flowerdiff.models.vgg import (
        IMAGENET_MEAN, IMAGENET_STD, VGGFeatures, load_vgg_params,
    )
    from flowerdiff.runner import PipelineRunner
    from flowerdiff.train.checkpoints import CheckpointManager
    from flowerdiff.utils.quality import frechet_distance, latent_mmd

    preset = get_preset(args.version)
    if args.tiny:
        preset = tiny_preset(preset)
    lat = preset.latent
    over = {}
    for k in ("cond_dropout", "ema_decay", "guidance_scale", "latent_cache"):
        v = getattr(args, k)
        if v is not None:
            over[k] = v
    if over:
        lat = dataclasses.replace(lat, **over)
    preset = dataclasses.replace(preset, latent=lat)

    runner = PipelineRunner(
        preset, results_dir=args.results_dir, dataset="synthetic",
        seed=args.seed, synthetic_size=args.synthetic_size,
    )
    ckpt = CheckpointManager(os.path.join(args.results_dir, "ckpt_diffusion"))
    all_steps = sorted(ckpt.all_steps()) if hasattr(ckpt, "all_steps") else []
    if args.steps:
        steps = [int(s) for s in args.steps.split(",")]
    else:
        steps = all_steps or [ckpt.latest_step()]
    assert steps and steps[0], f"no diffusion checkpoints in {args.results_dir}"

    # One restore drive builds the VAE + latent stats; later steps restore
    # into the same trainer.
    _, diff = runner.run_latent(total_epochs=steps[-1], final_sweep=False,
                                cadence_viz=False, restore_scope="params")
    vae, vae_params = runner._trained_vae
    decode_jit = jax.jit(
        lambda p, z: vae.apply({"params": p}, z, method=FlowerVAE.decode))

    @jax.jit
    def encode_mu(p, x):
        mu, _ = vae.apply({"params": p}, x,
                          method=FlowerVAE.encode_with_params)
        return mu

    vgg_model = VGGFeatures()
    vgg_params, _ = load_vgg_params()

    @jax.jit
    def pooled_feats(p, x):
        f = vgg_model.apply(
            p, (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD))
        return jnp.mean(f, axis=(1, 2))

    @jax.jit
    def pixel_feats(x):
        # backbone-free reference: 16x16 average-pooled raw pixels (768-d)
        n, h, w, c = x.shape
        f = x.reshape(n, 16, h // 16, 16, w // 16, c).mean(axis=(2, 4))
        return f.reshape(n, -1)

    real_imgs = runner.test_images[:256]
    real_lat = encode_mu(vae_params, real_imgs)
    real_sub = np.asarray(pooled_feats(vgg_params, real_imgs))
    real_pix = np.asarray(pixel_feats(real_imgs))

    from flowerdiff.train.checkpoints import state_to_tree, tree_into_state

    rows = []
    lcfg = diff.cfg
    for step in steps:
        restored = ckpt.restore(step=step, like=state_to_tree(diff.state))
        diff.state = tree_into_state(diff.state, restored)
        g = lcfg.guidance_scale
        sampler = DiffusionSampler(
            diff.model, {"params": diff.sampling_params}, diff.sched,
            (lcfg.latent_dim,), clip_x0=lcfg.clip_denoised, guidance_scale=g)
        if diff.latent_stats is not None:
            sampler = NormalizedSampler(sampler, *diff.latent_stats)
        rng = jax.random.key(args.seed + 11)
        classes = jnp.repeat(jnp.arange(26, dtype=jnp.int32), 4)
        gen_lat = sampler.sample(rng, 104, classes)
        gen_imgs = decode_jit(vae_params, gen_lat)
        gen_sub = np.asarray(pooled_feats(vgg_params, gen_imgs))
        gen_pix = np.asarray(pixel_feats(gen_imgs))
        row = {
            "step": int(step),
            "substitute_fd": float(frechet_distance(real_sub, gen_sub)),
            "pixel_fd": float(frechet_distance(real_pix, gen_pix)),
            "latent_mmd": float(latent_mmd(real_lat, gen_lat)),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    subs = [r["substitute_fd"] for r in rows]
    out = {
        "rows": rows,
        "spearman_substitute_vs_pixel_fd": spearman(
            subs, [r["pixel_fd"] for r in rows]),
        "spearman_substitute_vs_latent_mmd": spearman(
            subs, [r["latent_mmd"] for r in rows]),
        "n_checkpoints": len(rows),
    }
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))
    path = args.json or os.path.join("artifacts", "perceptual_ab",
                                     "fd_correlation.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
