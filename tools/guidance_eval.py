#!/usr/bin/env python
"""Guidance-scale probe on a trained checkpoint (follow-up to
tools/cond_sweep.py, where accuracy was still rising at the highest scale
tried). Loads a finished v1/v2 run and evaluates classifier accuracy +
held-out MMD across guidance scales — sampling-time only, no retraining.

Usage:
  python tools/guidance_eval.py --results_dir artifacts/demo_v1_cfg_1020 \
      --synthetic_size 1020 --cond_dropout 0.1 \
      --scales 1,3,5,7,9,12,15
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

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_dir", required=True)
    ap.add_argument("--version", default="v1")
    ap.add_argument("--synthetic_size", type=int, default=1020)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cond_dropout", type=float, default=0.1)
    ap.add_argument("--ema_decay", type=float, default=None,
                    help="must match the training run when probing an EMA "
                         "checkpoint (restore structure contains ema_params); "
                         "sampling then uses the EMA weights")
    ap.add_argument("--scales", default="1,3,5,7,9,12,15,20")
    ap.add_argument("--ddim_steps", type=int, default=50,
                    help="also evaluate a DDIM arm with this many steps "
                         "per guidance scale (0 = ancestral only)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from flowerdiff.configs import get_preset, tiny_preset
    from flowerdiff.diffusion.api import (
        DDIMSampler,
        DiffusionSampler,
        NormalizedSampler,
    )
    from flowerdiff.models.vae import FlowerVAE
    from flowerdiff.models.vgg import (
        IMAGENET_MEAN, IMAGENET_STD, VGGFeatures, load_vgg_params,
    )
    from flowerdiff.runner import PipelineRunner
    from flowerdiff.train.checkpoints import CheckpointManager
    from flowerdiff.utils.quality import (
        classifier_accuracy_on_samples,
        frechet_distance,
        latent_mmd,
    )

    preset = get_preset(args.version)
    if args.tiny:
        preset = tiny_preset(preset)
    preset = dataclasses.replace(
        preset,
        latent=dataclasses.replace(preset.latent,
                                   cond_dropout=args.cond_dropout,
                                   ema_decay=args.ema_decay),
    )
    runner = PipelineRunner(
        preset, results_dir=args.results_dir, dataset="synthetic",
        seed=args.seed, synthetic_size=args.synthetic_size,
    )
    saved = CheckpointManager(
        os.path.join(args.results_dir, "ckpt_diffusion")).latest_step()
    assert saved, f"no diffusion checkpoint under {args.results_dir}"
    _, diff = runner.run_latent(total_epochs=saved, final_sweep=False,
                                cadence_viz=False, restore_scope="params")

    vae, vae_params = runner._trained_vae
    classify_jit = jax.jit(
        lambda p, z: vae.apply({"params": p}, z, method=FlowerVAE.classify))

    def classify(z):
        return classify_jit(vae_params, z)

    @jax.jit
    def encode_mu(p, x):
        mu, _ = vae.apply({"params": p}, x,
                          method=FlowerVAE.encode_with_params)
        return mu

    decode_jit = jax.jit(
        lambda p, z: vae.apply({"params": p}, z, method=FlowerVAE.decode))
    vgg_model = VGGFeatures()
    vgg_params, _ = load_vgg_params()

    @jax.jit
    def pooled_feats(p, x):
        f = vgg_model.apply(
            p, (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD))
        return jnp.mean(f, axis=(1, 2))

    import numpy as np

    real = encode_mu(vae_params, runner.test_images[:256])
    real_feats = np.asarray(pooled_feats(vgg_params, runner.test_images[:256]))
    lcfg = diff.cfg
    arms = [("ancestral", None)]
    if args.ddim_steps > 0:
        arms.append(("ddim", args.ddim_steps))
    rows = []
    for s in [float(x) for x in args.scales.split(",")]:
        g = None if s <= 1.0 else s
        for arm, nsteps in arms:
            sampler = DiffusionSampler(
                diff.model, {"params": diff.sampling_params}, diff.sched,
                (lcfg.latent_dim,), clip_x0=lcfg.clip_denoised,
                guidance_scale=g)
            if diff.latent_stats is not None:
                sampler = NormalizedSampler(sampler, *diff.latent_stats)
            if arm == "ddim":
                sampler = DDIMSampler(sampler, num_steps=nsteps)
            rng = jax.random.key(args.seed + 7)
            acc26 = classifier_accuracy_on_samples(
                sampler, classify, rng, 102, n_per_class=4, max_classes=26)
            acc102 = classifier_accuracy_on_samples(
                sampler, classify, rng, 102, n_per_class=4, max_classes=102)
            classes = jnp.repeat(jnp.arange(26, dtype=jnp.int32), 4)
            gen = sampler.sample(jax.random.fold_in(rng, 1), 104, classes)
            gen_feats = np.asarray(
                pooled_feats(vgg_params, decode_jit(vae_params, gen)))
            row = {"guidance": s, "sampler": arm, "acc26": acc26,
                   "acc102": acc102,
                   "latent_mmd_heldout": float(latent_mmd(real, gen)),
                   "perceptual_fd_heldout": float(
                       frechet_distance(real_feats, gen_feats))}
            rows.append(row)
            print(json.dumps(row), flush=True)

    path = args.json or os.path.join(args.results_dir, "guidance_eval.json")
    # FD comparability stamp (utils/quality.py fd_stamp): this sweep's FD
    # column is a WITHIN-run axis — tools/fd_correlation.py measured that
    # substitute-backbone FD rankings do not transfer across independently
    # trained runs, so downstream deltas must check these stamps
    # (quality.check_fd_comparable) before comparing rows from two sweeps.
    from flowerdiff.utils.quality import fd_stamp
    stamp = fd_stamp(vgg_params, os.path.abspath(args.results_dir))
    with open(path, "w") as f:
        json.dump({"ckpt_epoch": saved, **stamp, "rows": rows}, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
