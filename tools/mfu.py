#!/usr/bin/env python
"""Roofline / MFU accounting (VERDICT r1 item 3).

For each hot path, reports: XLA-counted FLOPs, honest chained-protocol step
time, achieved TFLOP/s, and %-of-peak (MFU) against the TPU v5e bf16 MXU
peak (197 TFLOP/s; models run f32 params with default TPU matmul precision,
which executes on the MXU in bf16 passes).

FLOP counts come from XLA's own HLO cost analysis of the STRAIGHT-LINE
programs (the per-step denoiser eval and the decoder), not the scan-wrapped
pipeline — HLO cost analysis counts a while-loop body once, so the sampler
pipeline's FLOPs are assembled as n_steps * eps_flops + decode_flops.
Train-step FLOPs are cost_analysis of the full jitted step (no loops inside).

Paths measured:
  - sampler pipeline (1000-step XLA scan + decode), batch sweep
  - fused Pallas pipeline (same math, same FLOPs), batch sweep
  - VAE-GAN train step, full default objective (incl. VGG perceptual)
  - VAE-GAN train step without the perceptual term (round-1 configuration)
  - latent-diffusion train step (frozen-VAE encode included), f32 + bf16
  - pixel-space (v4/v5) train step f32 + bf16, and its 1000-step sampler
    at the v4 grid size (16) and reference batch (64)

A path is labeled dispatch-bound when its time barely moves with batch size;
compute-bound when time scales with FLOPs.

Usage: python tools/mfu.py [--batches 50,64,128,256,510] [--json OUT.json]
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

PEAK_FLOPS = 197e12  # TPU v5e bf16 MXU peak per chip


def hlo_costs(jitted, *args, **kwargs) -> tuple[float, float]:
    """XLA's own (flops, bytes accessed) for a compiled program. Bytes are
    XLA's pre-fusion accounting — an upper bound on real HBM traffic, still
    useful for spotting bandwidth-bound paths."""
    compiled = jitted.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return (float(ca.get("flops", float("nan"))),
            float(ca.get("bytes accessed", float("nan"))))


def hlo_flops(jitted, *args, **kwargs) -> float:
    return hlo_costs(jitted, *args, **kwargs)[0]


def chain_time(fn, make_x, k_short=4, k_long=16, repeats=2):
    """Chained data-dependent calls + differencing (see bench.py)."""
    def chain(k):
        x = make_x()
        t0 = time.perf_counter()
        for i in range(k):
            x = fn(x, i)
        np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]
        return time.perf_counter() - t0

    chain(2)  # warm
    t_s = min(chain(k_short) for _ in range(repeats))
    t_l = min(chain(k_long) for _ in range(repeats))
    return (t_l - t_s) / (k_long - k_short)


def fmt_row(name, batch, flops, secs):
    tf = flops / secs / 1e12
    mfu = 100.0 * flops / secs / PEAK_FLOPS
    print(f"{name:32s} b={batch:<4d} {flops/1e9:9.2f} GFLOP "
          f"{secs*1e3:8.2f} ms {tf:7.1f} TF/s  MFU {mfu:5.1f}%", flush=True)
    return {"path": name, "batch": batch, "gflop": flops / 1e9,
            "ms": secs * 1e3, "tflops": tf, "mfu_pct": mfu}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="50,64,128,256,510")
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-sampler", action="store_true")
    ap.add_argument("--skip-pixel", action="store_true")
    ap.add_argument("--train-batch", type=int, default=64)
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from flowerdiff.diffusion import linear_schedule
    from flowerdiff.diffusion.api import DiffusionSampler
    from flowerdiff.models import ConditionalLatentDenoiser
    from flowerdiff.models.vae import FlowerVAE

    print("devices:", jax.devices(), flush=True)
    rows = []
    rng = jax.random.key(0)
    model = ConditionalLatentDenoiser()
    vae = FlowerVAE()
    params = model.init(rng, jnp.zeros((1, 256)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)
    sched = linear_schedule()
    n_steps = sched.n_steps
    sampler = DiffusionSampler(model, params, sched, (256,))
    model_bf16 = ConditionalLatentDenoiser(dtype=jnp.bfloat16)
    sampler_bf16 = DiffusionSampler(model_bf16, params, sched, (256,))

    decode_jit = jax.jit(lambda vp, z: vae.apply(vp, z, method=FlowerVAE.decode))
    eps_jit = jax.jit(lambda p, x, t, c: model.apply(p, x, t, c))

    # ---- Sampler pipelines over the batch sweep. ----
    fused_ctx = None
    if not args.skip_fused and jax.default_backend() == "tpu":
        from flowerdiff.kernels.full_sampler import (
            fused_sample, prepare_fused_sampler,
        )
        fused_ctx = (fused_sample, prepare_fused_sampler(model, params))

    for batch in ([] if args.skip_sampler else batches):
        x0 = jnp.zeros((batch, 256))
        classes = jnp.arange(batch, dtype=jnp.int32) % 102
        t_vec = jnp.zeros((batch,), jnp.int32)
        eps_fl = hlo_flops(eps_jit, params, x0, t_vec, classes)
        dec_fl = hlo_flops(decode_jit, vae_params, x0)
        pipe_fl = n_steps * eps_fl + dec_fl

        @jax.jit
        def pipe_xla(p, vp, prev, key):
            cc = (classes + prev[0, 0, 0, 0].astype(jnp.int32) % 2) % 102
            z = sampler._sample_jit(p, sched, key, batch, cc)
            return vae.apply(vp, z, method=FlowerVAE.decode)

        secs = chain_time(
            lambda x, i: pipe_xla(params, vae_params, x, jax.random.fold_in(rng, i)),
            lambda: jnp.zeros((batch, 64, 64, 3)),
        )
        rows.append(fmt_row("sampler_pipeline_xla", batch, pipe_fl, secs)
                    | {"img_per_sec": batch / secs})

        @jax.jit
        def pipe_xla_bf16(p, vp, prev, key):
            cc = (classes + prev[0, 0, 0, 0].astype(jnp.int32) % 2) % 102
            z = sampler_bf16._sample_jit(p, sched, key, batch, cc)
            return vae.apply(vp, z, method=FlowerVAE.decode)

        secs = chain_time(
            lambda x, i: pipe_xla_bf16(params, vae_params, x,
                                       jax.random.fold_in(rng, i)),
            lambda: jnp.zeros((batch, 64, 64, 3)),
        )
        rows.append(fmt_row("sampler_pipeline_xla_bf16", batch, pipe_fl, secs)
                    | {"img_per_sec": batch / secs})

        if fused_ctx is not None:
            fused_sample, prep = fused_ctx
            prep_arrays = {k: v for k, v in prep.items() if k != "n_stages"}

            @jax.jit
            def pipe_fused(p, pa, vp, prev, key):
                cc = (classes + prev[0, 0, 0, 0].astype(jnp.int32) % 2) % 102
                z = fused_sample(model, p, sched, key, batch, cc,
                                 prep={**pa, "n_stages": prep["n_stages"]})
                return vae.apply(vp, z, method=FlowerVAE.decode)

            secs = chain_time(
                lambda x, i: pipe_fused(params, prep_arrays, vae_params, x,
                                        jax.random.fold_in(rng, i)),
                lambda: jnp.zeros((batch, 64, 64, 3)),
            )
            rows.append(fmt_row("sampler_pipeline_fused", batch, pipe_fl, secs)
                        | {"img_per_sec": batch / secs})

    # ---- Train steps (batch = reference 64). ----
    if args.skip_train:
        if not args.skip_pixel:
            pixel_section(args, rows, rng)
        if args.json:
            with open(args.json, "w") as f:
                json.dump({"peak_flops": PEAK_FLOPS,
                           "backend": jax.default_backend(), "rows": rows}, f,
                          indent=2)
        return
    from flowerdiff.models.vgg import VGGPerceptual
    from flowerdiff.train.latent_ddpm import (
        LatentDiffusionConfig,
        create_latent_diffusion_state,
        make_latent_diffusion_step,
    )
    from flowerdiff.train.schedules import vae_gan_loss_gates
    from flowerdiff.train.vae_gan import (
        VAEGANConfig,
        create_vae_gan_state,
        gates_array,
        make_vae_gan_step,
    )

    tb = args.train_batch
    images = jax.random.uniform(rng, (tb, 64, 64, 3))
    labels = jnp.arange(tb, dtype=jnp.int32) % 102
    gates = gates_array(vae_gan_loss_gates(200, 1200))

    for label, use_vgg, dtype, remat in (
        ("vae_gan_step_full_objective", True, "float32", False),
        ("vae_gan_step_no_perceptual", False, "float32", False),
        ("vae_gan_step_full_bf16", True, "bfloat16", False),
        ("vae_gan_step_full_remat", True, "float32", True),
        ("vae_gan_step_full_bf16_remat", True, "bfloat16", True),
    ):
        cfg = VAEGANConfig(total_steps=1000, use_perceptual=use_vgg,
                           compute_dtype=dtype, remat=remat)
        state, vae_t, disc = create_vae_gan_state(rng, cfg)
        vgg = VGGPerceptual() if use_vgg else None
        step = make_vae_gan_step(vae_t, disc, cfg, vgg=vgg)
        vgg_params = vgg.params if vgg else None
        step_args = (state, images, labels, gates, rng, vgg_params)
        flops, bytes_acc = hlo_costs(step, *step_args)
        print(f"  [{label}] bytes accessed {bytes_acc/1e9:.1f} GB, "
              f"arithmetic intensity {flops/bytes_acc:.1f} FLOP/B", flush=True)
        box = [state]

        def run(x, i, _box=box, _step=step, _vgg=vgg_params):
            _box[0], metrics = _step(_box[0], images, labels, gates,
                                     jax.random.fold_in(rng, i), _vgg)
            return metrics
        secs = chain_time(run, lambda: {"warm": jnp.zeros(())})
        rows.append(fmt_row(label, tb, flops, secs)
                    | {"img_per_sec": tb / secs})

    lcfg = LatentDiffusionConfig()
    dstate, dmodel, dsched = create_latent_diffusion_state(rng, lcfg)
    dstep = make_latent_diffusion_step(dmodel, vae, dsched, lcfg)
    vp_only = vae_params["params"]
    dargs = (dstate, vp_only, dsched, images, labels, None, rng)
    flops = hlo_flops(dstep, *dargs)
    dbox = [dstate]

    def drun(x, i):
        dbox[0], loss = dstep(dbox[0], vp_only, dsched, images, labels, None,
                              jax.random.fold_in(rng, i))
        return loss
    secs = chain_time(drun, lambda: jnp.zeros(()))
    rows.append(fmt_row("latent_ddpm_step", tb, flops, secs)
                | {"img_per_sec": tb / secs})

    # bf16 variant: what `--bf16` (configs.bf16_preset) actually runs —
    # denoiser compute AND the frozen-VAE encode both in bfloat16 (same f32
    # params; flax dtype= casts per use).
    lcfg_bf16 = LatentDiffusionConfig(compute_dtype="bfloat16")
    dstate16, dmodel16, dsched16 = create_latent_diffusion_state(rng, lcfg_bf16)
    vae_bf16 = FlowerVAE(dtype=jnp.bfloat16)
    dstep16 = make_latent_diffusion_step(dmodel16, vae_bf16, dsched16, lcfg_bf16)
    dargs16 = (dstate16, vp_only, dsched16, images, labels, None, rng)
    flops16, bytes16 = hlo_costs(dstep16, *dargs16)
    print(f"  [latent_ddpm_step_bf16] bytes accessed {bytes16/1e9:.1f} GB, "
          f"arithmetic intensity {flops16/bytes16:.1f} FLOP/B", flush=True)
    dbox16 = [dstate16]

    def drun16(x, i):
        dbox16[0], loss = dstep16(dbox16[0], vp_only, dsched16, images, labels,
                                  None, jax.random.fold_in(rng, i))
        return loss
    secs16 = chain_time(drun16, lambda: jnp.zeros(()))
    rows.append(fmt_row("latent_ddpm_step_bf16", tb, flops16, secs16)
                | {"img_per_sec": tb / secs16})

    if not args.skip_pixel:
        pixel_section(args, rows, rng)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"peak_flops": PEAK_FLOPS,
                       "backend": jax.default_backend(), "rows": rows}, f,
                      indent=2)
        print(f"wrote {args.json}")


def pixel_section(args, rows, rng):
    """Pixel-space (v4/v5) family rows: train step (f32 + bf16) at
    --train-batch, plus the 1000-step XLA-scan sampler at the v4 grid size
    (16) and the reference batch (64)."""
    from flowerdiff.diffusion.api import DiffusionSampler
    from flowerdiff.train.pixel_ddpm import (
        PixelDiffusionConfig,
        create_pixel_diffusion_state,
        make_pixel_diffusion_step,
    )

    tb = args.train_batch
    images = jax.random.uniform(rng, (tb, 64, 64, 3))

    for label, dtype in (("pixel_ddpm_step", "float32"),
                         ("pixel_ddpm_step_bf16", "bfloat16")):
        pcfg = PixelDiffusionConfig(compute_dtype=dtype)
        pstate, pmodel, psched = create_pixel_diffusion_state(rng, pcfg)
        pstep = make_pixel_diffusion_step(pmodel, psched)
        pflops, pbytes = hlo_costs(pstep, pstate, psched, images, rng)
        print(f"  [{label}] bytes accessed {pbytes/1e9:.1f} GB, "
              f"arithmetic intensity {pflops/pbytes:.1f} FLOP/B", flush=True)
        pbox = [pstate]

        def prun(x, i, _box=pbox, _step=pstep, _sched=psched):
            _box[0], loss = _step(_box[0], _sched, images,
                                  jax.random.fold_in(rng, i))
            return loss
        secs = chain_time(prun, lambda: jnp.zeros(()))
        rows.append(fmt_row(label, tb, pflops, secs)
                    | {"img_per_sec": tb / secs})

    # Sampler: the v4 sample grid is 16 images (v4:204-223, issued there
    # as 16 sequential batch-1 full reverse passes; here it is ONE call),
    # plus the reference batch 64.
    pcfg = PixelDiffusionConfig()
    pstate, pmodel, psched = create_pixel_diffusion_state(rng, pcfg)
    pparams = {"params": pstate.params}
    for pb in (16, 64):
        psampler = DiffusionSampler(pmodel, pparams, psched, (64, 64, 3),
                                    clip_x0=pcfg.clip_denoised)
        px = jnp.zeros((pb, 64, 64, 3))
        pt = jnp.zeros((pb,), jnp.int32)
        peps_jit = jax.jit(lambda p, x, t: pmodel.apply(p, x, t))
        peps_fl = hlo_flops(peps_jit, pparams, px, pt)
        pipe_fl = psched.n_steps * peps_fl

        @jax.jit
        def ppipe(p, prev, key, _s=psampler, _sched=psched, _pb=pb):
            key = jax.random.fold_in(
                key, prev[0, 0, 0, 0].astype(jnp.int32) % 2)
            return _s._sample_jit(p, _sched, key, _pb)

        secs = chain_time(
            lambda x, i, _pipe=ppipe: _pipe(
                pparams, x, jax.random.fold_in(rng, i)),
            lambda _pb=pb: jnp.zeros((_pb, 64, 64, 3)),
        )
        rows.append(fmt_row("pixel_sampler_xla", pb, pipe_fl, secs)
                    | {"img_per_sec": pb / secs})


if __name__ == "__main__":
    main()
