#!/usr/bin/env python
"""Decompose the latent-DDPM train step (VERDICT r3 item 1 groundwork).

The b64 step (frozen-VAE encode + denoiser fwd/bwd + AdamW) measured 2.85 ms
at 18% MFU while the same denoiser matmuls run ~100% MFU in the fused
sampling kernel. Before building a fused train kernel, split the step into
its parts and time each with the chained protocol (tools/mfu.py):

  - full step (f32 / bf16), batch 64
  - frozen-VAE encode alone, batch 64 / 256 / 1020 (whole synthetic split)
  - denoiser-only step (fwd+bwd+AdamW on precomputed latents), batch 64

This tells us whether the lever is (a) hoisting the encode out of the
per-step loop into one large-batch encode per epoch, (b) a Pallas fused
fwd+bwd for the denoiser, or both.

Usage: python tools/decompose_latent_step.py [--json OUT.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from mfu import chain_time, fmt_row, hlo_costs  # noqa: E402  (tools/mfu.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from flowerdiff.models.vae import FlowerVAE
    from flowerdiff.train.latent_ddpm import (
        LatentDiffusionConfig,
        create_latent_diffusion_state,
        make_latent_diffusion_step,
    )

    print("devices:", jax.devices(), flush=True)
    rng = jax.random.key(0)
    rows = []
    vae = FlowerVAE()
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)["params"]

    # ---- full step, f32 and bf16, b64 ----
    for label, dtype in (("latent_step_full", "float32"),
                         ("latent_step_full_bf16", "bfloat16")):
        cfg = LatentDiffusionConfig(compute_dtype=dtype)
        state, model, sched = create_latent_diffusion_state(rng, cfg)
        vae_t = vae if dtype == "float32" else FlowerVAE(dtype=jnp.bfloat16)
        step = make_latent_diffusion_step(model, vae_t, sched, cfg)
        images = jax.random.uniform(rng, (64, 64, 64, 3))
        labels = jnp.arange(64, dtype=jnp.int32) % 102
        fl, by = hlo_costs(step, state, vae_params, sched, images, labels,
                           None, rng)
        print(f"  [{label}] {by/1e9:.2f} GB, {fl/by:.0f} FLOP/B", flush=True)
        box = [state]

        def run(x, i, _b=box, _s=step):
            _b[0], loss = _s(_b[0], vae_params, sched, images, labels, None,
                             jax.random.fold_in(rng, i))
            return loss
        secs = chain_time(run, lambda: jnp.zeros(()))
        rows.append(fmt_row(label, 64, fl, secs))

    # ---- encode alone (reparameterized draw incl.), several batches ----
    for b in (64, 256, 1020):
        for label, vae_t in (("vae_encode", vae),
                             ("vae_encode_bf16", FlowerVAE(dtype=jnp.bfloat16))):
            images = jax.random.uniform(rng, (b, 64, 64, 3))

            @jax.jit
            def enc(vp, imgs, key):
                mu, logvar = vae_t.apply({"params": vp}, imgs,
                                         method=FlowerVAE.encode_with_params)
                return FlowerVAE.reparameterize(key, mu, logvar)

            fl, by = hlo_costs(enc, vae_params, images, rng)
            box = [images]

            def run(x, i, _b=box):
                # data-dependent chain: re-encode a shifted image batch
                return enc(vae_params, images + 1e-6 * x.ravel()[0],
                           jax.random.fold_in(rng, i))
            secs = chain_time(run, lambda: jnp.zeros((1, 1)))
            rows.append(fmt_row(label, b, fl, secs))

    # ---- denoiser-only step on precomputed latents, b64 ----
    from flowerdiff.diffusion import ddpm_eps_loss

    for label, dtype in (("denoiser_only_step", "float32"),
                         ("denoiser_only_step_bf16", "bfloat16")):
        cfg = LatentDiffusionConfig(compute_dtype=dtype)
        state, model, sched = create_latent_diffusion_state(rng, cfg)
        z = jax.random.normal(rng, (64, 256))
        labels = jnp.arange(64, dtype=jnp.int32) % 102

        @jax.jit
        def dstep(st, zz, key):
            key = jax.random.fold_in(key, st.step)
            loss_key, drop_key = jax.random.split(key)

            def loss_fn(p):
                def eps_fn(xt, t, c):
                    return model.apply({"params": p}, xt, t, c,
                                       deterministic=False,
                                       rngs={"dropout": drop_key})
                return ddpm_eps_loss(sched, eps_fn, loss_key, zz, labels,
                                     distance="euclidean")
            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads=grads), loss

        fl, by = hlo_costs(dstep, state, z, rng)
        print(f"  [{label}] {by/1e9:.3f} GB, {fl/by:.1f} FLOP/B", flush=True)
        box = [state]

        def run(x, i, _b=box):
            _b[0], loss = dstep(_b[0], z + 1e-6 * x, jax.random.fold_in(rng, i))
            return loss
        secs = chain_time(run, lambda: jnp.zeros(()))
        rows.append(fmt_row(label, 64, fl, secs))

    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump({"rows": rows}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
