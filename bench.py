#!/usr/bin/env python
"""Headline benchmark: 64x64 class-conditional image sampling throughput.

Pipeline measured (the reference's throughput north-star, SURVEY.md §3.3):
full 1000-step class-conditional latent-DDPM reverse process at reference
width (latent 256, hidden [256,512,1024,512,256], batch 50 = 10 classes x 5
samples, matching the sample grid v1:614-655) + VAE decode — all as ONE
jitted lax.scan program on the accelerator.

Baseline: the PyTorch reference's python-loop sampler measured by
baselines/torch_reference.py on this host (CPU — the only torch device
here; the reference itself ran mps/cuda/cpu, v1:1292-1293). The baseline
measurement is cached in BASELINE_MEASURED.json.

Prints exactly ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BASELINE_MEASURED.json")


def _log(*args):
    print(*args, file=sys.stderr, flush=True)


def measure_ours(batch=50, n_steps=1000, latent=256, repeats=6):
    """Fused-kernel sampling path (kernels/full_sampler.py: the whole
    1000-step reverse process as ONE Pallas kernel, weights VMEM-resident)
    + jitted VAE decode. Numerics: deterministic mode matches the XLA
    scan sampler to bf16 tolerance (tests/test_kernels.py); the ancestral
    noise stream is the on-core PRNG (implementation-defined, SURVEY §7.3)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from flowerdiff.diffusion import linear_schedule
    from flowerdiff.kernels.full_sampler import fused_sample, prepare_fused_sampler
    from flowerdiff.models import ConditionalLatentDenoiser
    from flowerdiff.models.vae import FlowerVAE

    _log(f"devices: {jax.devices()}")
    model = ConditionalLatentDenoiser()
    vae = FlowerVAE()
    rng = jax.random.key(0)
    x0 = jnp.zeros((batch, latent))
    t0 = jnp.zeros((batch,), jnp.int32)
    classes = jnp.arange(batch, dtype=jnp.int32) % 10
    params = model.init(rng, x0, t0, classes)
    vae_params = vae.init(
        {"params": rng}, jnp.zeros((1, 64, 64, 3)), rng, method=FlowerVAE.init_all
    )
    sched = linear_schedule(n_steps)
    prep = prepare_fused_sampler(model, params)

    # NB: params must be jit ARGUMENTS — closing over them bakes hundreds of
    # MB of weights in as XLA constants (minutes of compile, ~30ms/call).
    decode = jax.jit(
        lambda vp, z: vae.apply(vp, z, method=FlowerVAE.decode)
    )

    def pipeline(key):
        z = fused_sample(model, params, sched, key, batch, classes, prep=prep)
        return decode(vae_params, z)

    _log("compiling sampling pipeline (fused Pallas sampler)...")
    t_compile = time.perf_counter()
    out = jax.block_until_ready(pipeline(jax.random.key(1)))
    _log(f"compile+first run: {time.perf_counter() - t_compile:.1f}s, "
         f"out {out.shape}")

    times = []
    for i in range(repeats):
        start = time.perf_counter()
        jax.block_until_ready(pipeline(jax.random.key(i + 2)))
        times.append(time.perf_counter() - start)
    best = min(times)
    _log(f"run times: {[f'{t:.4f}' for t in times]}")
    return {
        "images_per_sec": batch / best,
        "steps_per_sec": n_steps / best,
        "seconds_per_grid": best,
        "batch": batch,
        "n_steps": n_steps,
        "backend": jax.default_backend(),
    }


def measure_baseline(force=False):
    if not force and os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)
    _log("measuring PyTorch reference baseline (cached afterwards)...")
    from baselines.torch_reference import measure_reference_sampling

    result = measure_reference_sampling(batch=50, n_steps=1000, measure_steps=30)
    with open(BASELINE_CACHE, "w") as fh:
        json.dump(result, fh, indent=2)
    return result


def main():
    ours = measure_ours()
    baseline = measure_baseline()
    vs = ours["images_per_sec"] / baseline["images_per_sec"]
    _log(f"ours: {ours['images_per_sec']:.2f} img/s ({ours['backend']}), "
         f"reference: {baseline['images_per_sec']:.4f} img/s "
         f"(torch {baseline['device']}) -> {vs:.1f}x")
    print(json.dumps({
        "metric": "images/sec 64x64 class-conditional sampling "
                  "(1000-step latent DDPM + VAE decode, batch 50)",
        "value": round(ours["images_per_sec"], 3),
        "unit": "images/sec",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
