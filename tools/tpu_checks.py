#!/usr/bin/env python
"""On-chip validation lane for TPU-only code paths (VERDICT r1 item 9).

The CI suite runs on CPU (tests/conftest.py forces the virtual-device CPU
platform), so the real Pallas kernel paths — most critically the IN-KERNEL
Box-Muller PRNG, whose int32 sign-extension bug was once caught only by a
noise-moments check — need a repeatable hardware lane. This tool is that
lane: run `python tools/tpu_checks.py` on a chip; it exits non-zero on any
failure and prints a record suitable for committing (artifacts/tpu_checks/).

Checks:
  1. noise-moments (closed form): with a ZERO eps-net, the fused stochastic
     sampler's output variance must match the analytic accumulation
     v <- v/alpha_t + beta_t over the full 1000-step reference schedule;
     mean ~ 0; per-sample lag-1 autocorrelation ~ 0.
  2. normality: skewness and excess kurtosis of the pooled noise within
     Gaussian sampling bounds.
  3. determinism + parity: the fused kernel in deterministic mode matches
     the XLA scan sampler at reference width (bf16 tolerance).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

FAILURES = []


def check(name, ok, detail):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name}: {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def main():
    from flowerdiff.diffusion import linear_schedule
    from flowerdiff.diffusion.api import DiffusionSampler
    from flowerdiff.kernels.full_sampler import fused_sample
    from flowerdiff.models import ConditionalLatentDenoiser

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", flush=True)
    if backend != "tpu":
        print("not a TPU — refusing to certify TPU-only paths", flush=True)
        sys.exit(2)

    sched = linear_schedule(1000)
    model = ConditionalLatentDenoiser()  # reference width
    batch, latent = 256, 256
    classes = jnp.arange(batch, dtype=jnp.int32) % 102
    params = model.init(jax.random.key(0), jnp.zeros((1, latent)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))

    # ---- 1+2: noise moments through the REAL kernel PRNG. ----
    zero_params = jax.tree.map(jnp.zeros_like, params)
    t0 = time.time()
    out = fused_sample(model, zero_params, sched, jax.random.key(3), batch,
                       classes, stochastic=True,
                       x_init=jnp.zeros((batch, latent), jnp.float32))
    out = np.asarray(out, np.float64)
    print(f"fused stochastic sample (zero net, 1000 steps, {batch}x{latent}) "
          f"in {time.time() - t0:.1f}s", flush=True)

    v = 0.0
    for t in range(sched.n_steps - 1, 0, -1):
        v = v / float(sched.alpha[t]) + float(sched.beta[t])
    v = v / float(sched.alpha[0])
    sample_var = float(out.var())
    rel = abs(sample_var - v) / v
    check("noise variance vs closed form", rel < 0.02,
          f"var {sample_var:.4f} vs analytic {v:.4f} (rel err {rel:.4f}, "
          f"n={out.size})")
    mean = float(out.mean())
    se = np.sqrt(v / out.size)
    check("noise mean ~ 0", abs(mean) < 5 * se,
          f"mean {mean:+.5f} (5-sigma bound {5 * se:.5f})")

    flat = (out / np.sqrt(v)).ravel()
    skew = float(((flat - flat.mean()) ** 3).mean())
    kurt = float(((flat - flat.mean()) ** 4).mean()) - 3.0
    n = flat.size
    check("normality: skewness", abs(skew) < 5 * np.sqrt(6.0 / n),
          f"skew {skew:+.5f} (bound {5 * np.sqrt(6.0 / n):.5f})")
    check("normality: excess kurtosis", abs(kurt) < 5 * np.sqrt(24.0 / n),
          f"kurt {kurt:+.5f} (bound {5 * np.sqrt(24.0 / n):.5f})")

    lag1 = float(np.mean(out[:, 1:] * out[:, :-1]) / out.var())
    check("lag-1 autocorrelation ~ 0", abs(lag1) < 0.02, f"rho1 {lag1:+.5f}")

    # ---- 3: deterministic fused == f32 XLA p_sample_mean scan, ref width. ----
    from flowerdiff.diffusion.ddpm import p_sample_mean

    sm_batch = 64
    sm_classes = classes[:sm_batch]
    x_init = jax.random.normal(jax.random.key(7), (sm_batch, latent))

    @jax.jit
    def det_scan(p, sc, x0):
        def body(carry, _):
            x, t = carry
            tv = jnp.full((x.shape[0],), t, jnp.int32)
            eps = model.apply(p, x, tv, sm_classes)
            return (p_sample_mean(sc, x, tv, eps), t - 1), None

        (x, _), _ = jax.lax.scan(
            body, (x0, jnp.int32(sc.n_steps - 1)), None, length=sc.n_steps
        )
        return x

    xla = det_scan(params, sched, x_init)
    fused = fused_sample(model, params, sched, jax.random.key(8), sm_batch,
                         sm_classes, stochastic=False, x_init=x_init)
    fused2 = fused_sample(model, params, sched, jax.random.key(999), sm_batch,
                          sm_classes, stochastic=False, x_init=x_init)
    det = float(jnp.max(jnp.abs(fused - fused2)))
    check("fused deterministic mode is key-independent", det == 0.0,
          f"max |Δ| across different keys {det:.2e}")
    rel_l2 = float(jnp.linalg.norm(fused - xla) / jnp.linalg.norm(xla))
    check("fused (bf16 kernel) vs XLA f32 deterministic scan, 1000 steps",
          rel_l2 < 0.05, f"relative L2 {rel_l2:.4f} over {sm_batch}x{latent}")

    print(f"\n{len(FAILURES)} failure(s)" if FAILURES else "\nall checks passed",
          flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
