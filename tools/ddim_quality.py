#!/usr/bin/env python
"""DDIM quality-vs-steps table (VERDICT r2 item 8).

Loads a trained v1/v2/v3 run (train-if-missing: pass the results_dir of a
completed CLI run and it restores from its checkpoints), then measures, for
ancestral-1000 (the reference's only sampling mode, v1:594-598) and DDIM at
{250, 100, 50, 25} steps:

  - classifier accuracy on generated samples (utils/quality.py protocol)
  - latent MMD vs the held-out split
  - sampling latency for one 104-sample batch (timed, post-warmup)

Usage:
  python tools/ddim_quality.py --results_dir artifacts/demo_v1_cfg_1020 \
      --synthetic_size 1020 [--guidance_scale 3.0 --cond_dropout 0.1] \
      [--json artifacts/ddim_quality.json]

Flags must match the run that produced the checkpoints (they shape the
restored config).
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
    ap.add_argument("--results_dir", required=True)
    ap.add_argument("--version", default="v1")
    ap.add_argument("--synthetic_size", type=int, default=1020)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--total_epochs", type=int, default=None,
                    help="epoch count of the saved diffusion ckpt "
                         "(default: latest)")
    ap.add_argument("--cond_dropout", type=float, default=None)
    ap.add_argument("--guidance_scale", type=float, default=None)
    ap.add_argument("--ema_decay", type=float, default=None,
                    help="must match the training run when probing an EMA "
                         "checkpoint; sampling then uses the EMA weights")
    ap.add_argument("--ddim_steps", default="250,100,50,25")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny preset (match a --tiny smoke run)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from flowerdiff.configs import get_preset
    from flowerdiff.diffusion.api import DDIMSampler
    from flowerdiff.models.vae import FlowerVAE
    from flowerdiff.runner import PipelineRunner
    from flowerdiff.train.checkpoints import CheckpointManager
    from flowerdiff.utils.quality import (
        classifier_accuracy_on_samples,
        latent_mmd,
    )

    preset = get_preset(args.version)
    if args.tiny:
        from flowerdiff.configs import tiny_preset

        preset = tiny_preset(preset)
    if (args.cond_dropout is not None or args.guidance_scale is not None
            or args.ema_decay is not None):
        preset = dataclasses.replace(
            preset, latent=dataclasses.replace(
                preset.latent,
                cond_dropout=args.cond_dropout or preset.latent.cond_dropout,
                guidance_scale=args.guidance_scale,
                ema_decay=args.ema_decay,
            ),
        )
    runner = PipelineRunner(
        preset, results_dir=args.results_dir, dataset="synthetic",
        seed=args.seed, synthetic_size=args.synthetic_size,
    )
    saved = args.total_epochs or CheckpointManager(
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

    real = encode_mu(vae_params, runner.test_images[:256])
    base = diff.sampler()

    def eval_sampler(name, sampler, steps):
        rng = jax.random.key(args.seed + 7)
        acc = classifier_accuracy_on_samples(
            sampler, classify, rng, 102, n_per_class=4, max_classes=26)
        classes = jnp.repeat(jnp.arange(26, dtype=jnp.int32), 4)
        gen = sampler.sample(jax.random.fold_in(rng, 1), 104, classes)
        mmd = latent_mmd(real, gen)
        # latency: warm, then best-of-3 timed batches
        sampler.sample(rng, 104, classes).block_until_ready()
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            sampler.sample(jax.random.fold_in(rng, i), 104,
                           classes).block_until_ready()
            times.append(time.perf_counter() - t0)
        row = {"sampler": name, "steps": steps, "acc26": acc,
               "latent_mmd_heldout": float(mmd),
               "ms_per_104_batch": round(min(times) * 1e3, 2)}
        print(json.dumps(row), flush=True)
        return row

    rows = [eval_sampler("ancestral", base, base.sched.n_steps)]
    for n in [int(x) for x in args.ddim_steps.split(",")]:
        rows.append(eval_sampler("ddim", DDIMSampler(base, num_steps=n), n))

    out = {"results_dir": args.results_dir, "ckpt_epoch": saved,
           "guidance_scale": args.guidance_scale, "rows": rows}
    path = args.json or os.path.join(args.results_dir, "ddim_quality.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
