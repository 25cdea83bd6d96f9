#!/usr/bin/env python
"""Training-horizon probe for conditioning quality (round-3 follow-up).

The round-3 sweep (artifacts/cond_sweep_r3/STUDY.md) found the training
horizon DOMINATES conditioning quality — 3k -> 10k epochs roughly doubled
classifier accuracy at every guidance scale, and the eps-loss was still
falling at 10k. The reference's own `__main__` trains total_epochs=10000
(v1:1432). This probe extends the best arm (cond_dropout 0.1, shared
projections, z-scored latents) to 30,000 epochs, pausing at 10k/20k/30k to
score classifier accuracy at guidance {7, 10, 15, 20} on final and EMA
weights — the accuracy-vs-horizon curve the sweep left open.

Protocol identical to tools/cond_sweep.py (same seeds, same
synthetic-1020 reference-scale data, acc26 = 26 classes x 4 samples,
acc102 = all 102): rows are directly comparable with sweep.json.

Usage: python tools/horizon_probe.py [--out artifacts/horizon_probe]
       [--quick]
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--out", default="artifacts/horizon_probe")
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
    milestones = [4, 8] if args.quick else [10000, 20000, 30000]
    chunk = 4 if args.quick else 50
    batch = 16 if args.quick else 64
    n_data = 64 if args.quick else 1020
    guidances = [7.0] if args.quick else [7.0, 10.0, 15.0, 20.0]

    images, labels = synthetic_flowers(n_data, 102, 64, seed=seed)
    ds = DeviceDataset(images, labels)
    steps_per_epoch = max(1, n_data // batch)

    # ---- shared VAE at the reference schedule (same seed as the sweep) ----
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
        _, (best, _, best_state) = vtrainer.run_epochs_fused(
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

    real_acc = float(jnp.mean(
        (jnp.argmax(classify(z_all), axis=-1) == ds.labels).astype(jnp.float32)))
    print(f"classifier ceiling on real encoded latents: {real_acc:.3f}",
          flush=True)

    # ---- single best-arm denoiser, evaluated at horizon milestones ----
    lcfg = LatentDiffusionConfig(
        steps_per_epoch=steps_per_epoch, cond_dropout=0.1,
        shared_cond_proj=True, normalize_latents=True, clip_denoised=3.0,
        **({"latent_dim": 16, "hidden_dims": (16, 32, 16),
            "time_emb_dim": 16} if args.quick else {}),
    )
    trainer = LatentDiffusionTrainer(
        lcfg, vae, jax.random.key(seed + 11), latent_stats=stats)
    ema = jax.tree.map(jnp.copy, trainer.state.params)

    results = []

    def evaluate(horizon, losses, train_s):
        final_loss = float(np.mean(losses)) if losses is not None else None
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
                row = {"horizon": horizon, "params": params_name,
                       "guidance": g, "acc26": acc26, "acc102": acc102,
                       "train_s": round(train_s, 1),
                       "final_eps_loss": (round(final_loss, 4)
                                          if final_loss is not None else None)}
                results.append(row)
                print(json.dumps(row), flush=True)

    e = 0
    t_train = 0.0
    for milestone in milestones:
        t0 = time.time()
        losses = None
        while e < milestone:
            n = min(chunk, milestone - e)
            losses = trainer.run_epochs_fused(
                ds, n, vae_params, jax.random.fold_in(jax.random.key(seed), e),
                batch,
            )
            ema = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, ema,
                               trainer.state.params)
            e += n
        t_train += time.time() - t0
        evaluate(milestone, losses, t_train)

    out = {
        "protocol": "identical to cond_sweep_r3 (acc26 round-2 comparable; "
                    "acc102 all classes)",
        "arm": "d0.1 shared projections, z-scored latents, clip 3.0",
        "ceiling_real_latents": real_acc,
        "chance": 1.0 / 102,
        "vae_epochs": vae_epochs,
        "data": f"synthetic-{n_data}",
        "rows": results,
    }
    with open(os.path.join(args.out, "probe.json"), "w") as f:
        json.dump(out, f, indent=2)
    best_row = max(results, key=lambda r: r["acc26"])
    print("BEST:", json.dumps(best_row))
    print(f"wrote {args.out}/probe.json")


if __name__ == "__main__":
    main()
