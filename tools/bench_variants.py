#!/usr/bin/env python
"""Exploration benchmark: sampling-pipeline variants on the real chip.

Variants:
  xla_f32     — flax forward, float32 (the bench.py default today)
  xla_bf16    — flax forward with params+activations cast to bf16
                (schedule/posterior math stays f32)
  pallas_bf16 — fused Pallas stage kernels (kernels/denoiser_apply.py)

Prints one human-readable line per variant. Used to pick bench.py's default.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from flowerdiff.diffusion import linear_schedule, sample
from flowerdiff.kernels import make_fast_denoiser
from flowerdiff.models import ConditionalLatentDenoiser
from flowerdiff.models.vae import FlowerVAE

BATCH = 50
LATENT = 256
N_STEPS = 1000


def time_pipeline(eps_fn, decode_fn, label):
    sched = linear_schedule(N_STEPS)

    @jax.jit
    def pipeline(key, classes):
        z = sample(sched, eps_fn, key, (BATCH, LATENT), classes)
        return decode_fn(z)

    classes = jnp.arange(BATCH, dtype=jnp.int32) % 10
    t0 = time.perf_counter()
    out = jax.block_until_ready(pipeline(jax.random.key(0), classes))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(jax.random.key(i + 1), classes))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label:12s} compile {compile_s:6.1f}s   best {best*1000:7.2f}ms "
          f"  {BATCH/best:8.1f} img/s   {N_STEPS/best:9.0f} steps/s",
          flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = jax.random.key(0)
    model = ConditionalLatentDenoiser()
    vae = FlowerVAE()
    x0 = jnp.zeros((BATCH, LATENT))
    t0_ = jnp.zeros((BATCH,), jnp.int32)
    c0 = jnp.zeros((BATCH,), jnp.int32)
    params = model.init(rng, x0, t0_, c0)
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)

    def decode_fn(z):
        return vae.apply(vae_params, z, method=FlowerVAE.decode)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "xla_f32"):
        def eps_f32(xt, t, c):
            return model.apply(params, xt, t, c)
        time_pipeline(eps_f32, decode_fn, "xla_f32")

    if which in ("all", "xla_bf16"):
        params_bf16 = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params,
        )
        def eps_bf16(xt, t, c):
            out = model.apply(params_bf16, xt.astype(jnp.bfloat16), t, c)
            return out.astype(jnp.float32)
        time_pipeline(eps_bf16, decode_fn, "xla_bf16")

    if which in ("all", "pallas_bf16"):
        fast = make_fast_denoiser(model, params, interpret=False)
        time_pipeline(fast, decode_fn, "pallas_bf16")


if __name__ == "__main__":
    main()
