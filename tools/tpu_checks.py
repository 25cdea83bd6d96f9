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

    # ---- 4: fused train-step kernel grads vs XLA at reference width. ----
    # SGD(1.0) states make updated params = params - grads, sidestepping
    # Adam's sign-noise on near-zero grads.
    import dataclasses

    import optax
    from flax.training.train_state import TrainState

    from flowerdiff.kernels.train_step import make_kernel_denoise_body
    from flowerdiff.train.latent_ddpm import (
        LatentDiffusionConfig,
        create_latent_diffusion_state,
        make_latent_denoise_body,
    )

    cfg0 = LatentDiffusionConfig(dropout_rate=0.0)
    state0, model0, sched0 = create_latent_diffusion_state(
        jax.random.key(0), cfg0)
    zb = jax.random.normal(jax.random.key(1), (64, 256))
    labs = jnp.arange(64, dtype=jnp.int32) % 102
    keys3 = jax.random.split(jax.random.key(3), 3)

    def sgd_state():
        return TrainState.create(
            apply_fn=model0.apply,
            params=jax.tree.map(jnp.copy, state0.params), tx=optax.sgd(1.0))

    kern0 = make_kernel_denoise_body(model0, cfg0, dtype=jnp.float32,
                                     interpret=False)
    xla0 = jax.jit(make_latent_denoise_body(model0, cfg0))
    s_k, loss_k = kern0(sgd_state(), sched0, zb, labs, None, *keys3)
    s_x, loss_x = xla0(sgd_state(), sched0, zb, labs, None, *keys3)
    worst = 0.0
    for xa, xb in zip(jax.tree.leaves(s_k.params), jax.tree.leaves(s_x.params)):
        d = float(jnp.max(jnp.abs(xa - xb)))
        worst = max(worst, d)
    check("train-step kernel (f32) grads vs XLA, reference width b64",
          worst < 2e-3 and abs(float(loss_k) - float(loss_x)) < 1e-2,
          f"max param-update |Δ| {worst:.2e}, loss {float(loss_k):.4f} vs "
          f"{float(loss_x):.4f}")

    # bf16 prod mode with dropout: finite + loss in family
    cfg3 = LatentDiffusionConfig(dropout_rate=0.3, cond_dropout=0.1,
                                 ema_decay=0.999)
    state3, model3, _ = create_latent_diffusion_state(jax.random.key(0), cfg3)
    kern3 = jax.jit(make_kernel_denoise_body(model3, cfg3,
                                             dtype=jnp.bfloat16,
                                             interpret=False),
                    donate_argnums=(0,))
    s3, l3 = kern3(state3, sched0, zb, labs, None, *keys3)
    check("train-step kernel bf16+dropout runs at reference width",
          bool(jnp.isfinite(l3)), f"loss {float(l3):.4f}")

    # ---- 5: whole-epoch mega kernel — tiny width runs; reference width is
    # a KNOWN VMEM boundary (BASELINE round 4). Flag if that ever changes.
    from flowerdiff.kernels.train_epoch import make_mega_epoch_fn

    cfg_t = LatentDiffusionConfig(latent_dim=32, hidden_dims=(64, 128, 64),
                                  time_emb_dim=32, num_classes=16,
                                  steps_per_epoch=4)
    st_t, mdl_t, sch_t = create_latent_diffusion_state(jax.random.key(0),
                                                       cfg_t)
    mega_t = make_mega_epoch_fn(mdl_t, cfg_t, 4, 32, dtype=jnp.bfloat16,
                                stochastic=True, interpret=False)
    zt = jax.random.normal(jax.random.key(2), (4, 32, 32))
    lt = jax.random.randint(jax.random.key(3), (4, 32), 0, 16)
    st_t, losses_t = mega_t(st_t, sch_t, zt, lt, jax.random.key(4))
    check("mega epoch kernel (tiny width, in-kernel AdamW+PRNG)",
          bool(jnp.all(jnp.isfinite(losses_t))),
          f"losses {[round(float(x), 3) for x in losses_t]}")

    # fresh state: state3 was DONATED to kern3 above (copying a donated
    # tree raises "Array has been deleted" — caught by the r5 lane run)
    state_m, _, _ = create_latent_diffusion_state(jax.random.key(0), cfg3)
    mega_r = make_mega_epoch_fn(model3, cfg3, 15, 64, dtype=jnp.bfloat16,
                                stochastic=True, interpret=False)
    try:
        zr = jax.random.normal(jax.random.key(5), (15, 64, 256))
        lr_ = jax.random.randint(jax.random.key(6), (15, 64), 0, 102)
        _st, _lo = mega_r(state_m, sched0, zr, lr_, jax.random.key(7))
        jax.block_until_ready(_lo)
        check("mega epoch kernel at REFERENCE width (grad-scratch fix)",
              bool(jnp.all(jnp.isfinite(_lo))),
              f"compiles + runs; losses finite, first "
              f"{[round(float(x), 3) for x in _lo[:3]]} "
              f"(r4's 174.5MB VMEM overflow resolved by grad parking)")
    except Exception as exc:  # noqa: BLE001
        msg = str(exc)
        # Two documented failure modes at reference width: the r4 terminal
        # reported a clean 174.5MB VMEM overflow; the current terminal's
        # remote compile helper crashes opaquely (exit 1, diagnostic hidden
        # server-side; local AOT diagnosis blocked by a client/terminal
        # libtpu version mismatch). Widths <= (192,384,768,384,192) compile
        # and beat same-width XLA ~2x (artifacts/mega_epoch_probe_r5_w192).
        known = ("vmem" in msg.lower() or "memory" in msg.lower()
                 or "tpu_compile_helper" in msg)
        check("mega kernel reference-width compile boundary is as documented",
              known, f"{type(exc).__name__}: {msg[:120]}")

    print(f"\n{len(FAILURES)} failure(s)" if FAILURES else "\nall checks passed",
          flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
