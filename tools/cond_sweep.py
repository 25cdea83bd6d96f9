#!/usr/bin/env python
"""Conditioning-quality lever sweep (VERDICT r2 item 4).

Round 2 landed at classifier accuracy 0.279 (28.5x chance) with CFG
(cond_dropout 0.1, guidance 3.0) — 29% of the ~0.96 ceiling the same
classifier reaches on real encoded latents. This sweep tries the untried
levers on one shared reference-schedule VAE:

  - guidance scale {1 (off), 1.5, 3, 5, 7}   (sampling-time only)
  - cond_dropout {0.1, 0.2}
  - shared (v1:544) vs separate (v3:818) condition projections
  - training horizon 3,000 vs 10,000 epochs (fused dispatches make the
    10k arm ~11 min, v1:1432 trains 10,000)
  - denoiser-weight EMA for sampling (host-side EMA over fused-chunk
    endpoint snapshots — 60+ snapshots at 50-epoch spacing)

Every arm: synthetic-1020 (10/class, the reference's real train-split
scale, v1:1299), z-scored latents, clip_denoised=3, seed 42, batch 64.
Accuracy protocol matches round 2 (utils/quality.py defaults: 26 classes
x 4 samples) for comparability, plus an all-102-class column.

Usage: python tools/cond_sweep.py [--out artifacts/cond_sweep_r3]
       [--quick]   (tiny schedule smoke on CPU)
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/cond_sweep_r3")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from flowerdiff.data.pipeline import DeviceDataset
    from flowerdiff.data.synthetic import synthetic_flowers
    from flowerdiff.diffusion.api import DiffusionSampler, NormalizedSampler
    from flowerdiff.models.vae import FlowerVAE
    from flowerdiff.train.latent_ddpm import (
        LatentDiffusionConfig,
        LatentDiffusionTrainer,
    )
    from flowerdiff.train.vae_gan import VAEGANConfig, VAEGANTrainer
    from flowerdiff.utils.quality import classifier_accuracy_on_samples

    seed = args.seed
    vae_epochs = 8 if args.quick else 1200
    horizon = 6 if args.quick else 3000
    long_horizon = 10 if args.quick else 10000
    chunk = 4 if args.quick else 50
    batch = 16 if args.quick else 64
    n_data = 64 if args.quick else 1020

    images, labels = synthetic_flowers(n_data, 102, 64, seed=seed)
    ds = DeviceDataset(images, labels)
    steps_per_epoch = max(1, n_data // batch)

    # ---- shared VAE at the reference schedule ----
    t0 = time.time()
    vcfg = VAEGANConfig(
        total_steps=vae_epochs * steps_per_epoch,
        use_perceptual=not args.quick,
        **({"latent_dim": 16, "channels": (8, 16, 24, 32), "head_width": 32}
           if args.quick else {}),
    )
    vae_rng = jax.random.key(seed)
    vtrainer = VAEGANTrainer(vcfg, vae_rng)
    best = float("inf")
    best_state = jax.tree.map(jnp.copy, vtrainer.state)
    epoch = 0
    while epoch < vae_epochs:
        n = min(chunk, vae_epochs - epoch)
        chunk_metrics, (best, _, best_state) = vtrainer.run_epochs_fused(
            ds, epoch, vae_epochs, n, jax.random.fold_in(vae_rng, epoch),
            batch, best=(best, best_state),
        )
        epoch += n
    vae_params = best_state.gen.params
    vae = vtrainer.vae
    print(f"VAE: {vae_epochs} epochs in {time.time()-t0:.0f}s, "
          f"best total {best:.3f}", flush=True)

    @jax.jit
    def enc_z(p, x, key):
        mu, logvar = vae.apply({"params": p}, x,
                               method=FlowerVAE.encode_with_params)
        return FlowerVAE.reparameterize(key, mu, logvar)

    imgs_f = ds.full()[0]
    z_all = enc_z(vae_params, imgs_f, jax.random.key(seed + 3))
    stats = (jnp.mean(z_all, axis=0),
             jnp.maximum(jnp.std(z_all, axis=0), 1e-3))

    classify_jit = jax.jit(
        lambda p, z: vae.apply({"params": p}, z, method=FlowerVAE.classify))

    def classify(z):
        return classify_jit(vae_params, z)

    # ceiling: the classifier on real encoded latents
    real_acc = float(jnp.mean(
        (jnp.argmax(classify(z_all), axis=-1) == ds.labels).astype(jnp.float32)))
    print(f"classifier ceiling on real encoded latents: {real_acc:.3f}",
          flush=True)

    # ---- denoiser arms ----
    arm_specs = [
        ("d0.1_shared_3k", 0.1, True, horizon),
        ("d0.2_shared_3k", 0.2, True, horizon),
        ("d0.1_separate_3k", 0.1, False, horizon),
        ("d0.1_shared_10k", 0.1, True, long_horizon),
    ]
    guidances = [None, 1.5, 3.0, 5.0, 7.0]
    results = []
    for name, dropout, shared, n_epochs in arm_specs:
        t0 = time.time()
        lcfg = LatentDiffusionConfig(
            steps_per_epoch=steps_per_epoch, cond_dropout=dropout,
            shared_cond_proj=shared, normalize_latents=True,
            clip_denoised=3.0,
            **({"latent_dim": 16, "hidden_dims": (16, 32, 16),
                "time_emb_dim": 16} if args.quick else {}),
        )
        trainer = LatentDiffusionTrainer(
            lcfg, vae, jax.random.key(seed + 11), latent_stats=stats)
        # host-side EMA over fused-chunk endpoint snapshots (w=0.9: the
        # last ~10 snapshots = 500 epochs dominate)
        ema = jax.tree.map(jnp.copy, trainer.state.params)
        e = 0
        while e < n_epochs:
            n = min(chunk, n_epochs - e)
            losses = trainer.run_epochs_fused(
                ds, n, vae_params, jax.random.fold_in(jax.random.key(seed), e),
                batch,
            )
            ema = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, ema,
                               trainer.state.params)
            e += n
        train_s = time.time() - t0
        final_loss = float(np.mean(losses))

        for params_name, params in (("final", trainer.state.params),
                                    ("ema", ema)):
            for g in guidances:
                sampler = DiffusionSampler(
                    trainer.model, {"params": params}, trainer.sched,
                    (lcfg.latent_dim,), clip_x0=3.0, guidance_scale=g)
                sampler = NormalizedSampler(sampler, *stats)
                acc26 = classifier_accuracy_on_samples(
                    sampler, classify, jax.random.key(seed + 7), 102,
                    n_per_class=4, max_classes=26)
                acc102 = classifier_accuracy_on_samples(
                    sampler, classify, jax.random.key(seed + 7), 102,
                    n_per_class=4, max_classes=102)
                row = {"arm": name, "params": params_name,
                       "guidance": g or 1.0, "acc26": acc26,
                       "acc102": acc102, "dropout": dropout,
                       "shared_proj": shared, "epochs": n_epochs,
                       "train_s": round(train_s, 1),
                       "final_eps_loss": round(final_loss, 4)}
                results.append(row)
                print(json.dumps(row), flush=True)

    out = {
        "protocol": "acc26: 26 classes x 4 samples (round-2 comparable); "
                    "acc102: all classes x 4",
        "ceiling_real_latents": real_acc,
        "chance": 1.0 / 102,
        "vae_epochs": vae_epochs,
        "data": f"synthetic-{n_data} (10/class at 1020 = reference scale)",
        "rows": results,
    }
    with open(os.path.join(args.out, "sweep.json"), "w") as f:
        json.dump(out, f, indent=2)
    best_row = max(results, key=lambda r: r["acc26"])
    print("BEST:", json.dumps(best_row))
    print(f"wrote {args.out}/sweep.json")


if __name__ == "__main__":
    main()
