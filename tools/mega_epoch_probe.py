#!/usr/bin/env python
"""Reference-width compile + timing probe for the whole-epoch mega-kernel
(kernels/train_epoch.py) — VERDICT r4 item 4.

Round 4 left the kernel VMEM-blocked at reference width (174.5 MB demanded
vs 128 MB; 59.6 MB register-spill slots from the unrolled 76-leaf update
chain) and landed the grad-parking scratch fix (commit b58837e) without an
on-chip compile check. This probe answers, on the real chip:

  1. does the kernel COMPILE at reference width (latent 256, hidden
     (256,512,1024,512,256), 102 classes, 16x64 steps/epoch) in the prod
     configuration (bf16 matmuls, bf16-resident moments, grad scratch)?
  2. ms/epoch (chained protocol, min of repeats) vs the latent-cache XLA
     step path (BASELINE round 4: 15.0 ms/epoch).

Usage: python tools/mega_epoch_probe.py [--json OUT.json] [--no-xla]
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


def chain_epochs(epoch_fn, state0, sched, z_rows, labels, k_short=4,
                 k_long=12, repeats=2):
    """Chained data-dependent epochs + differencing (tools/mfu.py
    protocol): each epoch consumes the previous state, and the rng folds
    per call, so the axon relay cannot memoize."""
    def chain(k, seed):
        # copy: fused paths donate the state argument, and the chain re-uses
        # state0 across repeats
        st = jax.tree.map(jnp.copy, state0)
        t0 = time.perf_counter()
        for i in range(k):
            st, losses = epoch_fn(st, sched, z_rows, labels,
                                  jax.random.key(seed * 1000 + i))
        np.asarray(losses)[:1]
        jax.tree.leaves(st.params)[0].block_until_ready()
        return time.perf_counter() - t0

    chain(2, 7)  # warm
    t_s = min(chain(k_short, 11 + r) for r in range(repeats))
    t_l = min(chain(k_long, 17 + r) for r in range(repeats))
    return (t_l - t_s) / (k_long - k_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--no-xla", action="store_true",
                    help="skip the XLA cached-path comparison timing")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hidden", default=None,
                    help="comma widths, e.g. 192,384,768,384,192 "
                         "(default: reference 256,512,1024,512,256). The "
                         "round-5 ladder: reference width FAILS on the "
                         "current terminal (opaque tpu_compile_helper exit 1"
                         " — the r4 terminal gave a clean 174.5MB VMEM "
                         "diagnostic; local AOT diagnosis is blocked by a "
                         "client/terminal libtpu version mismatch), while "
                         "(192,384,768,384,192) and below compile and run "
                         "3-6x faster than the same-width XLA cached path.")
    args = ap.parse_args()

    from flowerdiff.kernels.train_epoch import make_mega_epoch_fn
    from flowerdiff.train.latent_ddpm import (
        LatentDiffusionConfig,
        create_latent_diffusion_state,
    )

    S, B = args.steps, args.batch
    hidden = (tuple(int(x) for x in args.hidden.split(","))
              if args.hidden else (256, 512, 1024, 512, 256))
    cfg = LatentDiffusionConfig(  # reference width, flagship recipe knobs
        steps_per_epoch=S, cond_dropout=0.1, hidden_dims=hidden,
    )
    state, model, sched = create_latent_diffusion_state(jax.random.key(0), cfg)
    z_rows = jax.random.normal(jax.random.key(1), (S, B, cfg.latent_dim))
    labels = jax.random.randint(jax.random.key(2), (S, B), 0, cfg.num_classes)

    out = {"backend": jax.default_backend(), "steps_per_epoch": S,
           "batch": B,
           "width": "reference" if args.hidden is None else str(hidden)}

    print(f"[probe] backend={jax.default_backend()} S={S} B={B} "
          f"hidden={cfg.hidden_dims}", flush=True)

    mega = make_mega_epoch_fn(model, cfg, S, B, dtype=jnp.bfloat16,
                              stochastic=True)
    mega_j = jax.jit(mega)
    t0 = time.perf_counter()
    try:
        st1, losses = mega_j(state, sched, z_rows, labels, jax.random.key(9))
        jax.block_until_ready(losses)
        compile_s = time.perf_counter() - t0
        finite = bool(np.isfinite(np.asarray(losses)).all())
        out["mega_compiles"] = True
        out["mega_compile_s"] = round(compile_s, 1)
        out["mega_losses_finite"] = finite
        print(f"[probe] mega kernel COMPILED at reference width in "
              f"{compile_s:.1f}s; losses finite={finite} "
              f"first={np.asarray(losses)[:3].round(3).tolist()}", flush=True)
        ms = chain_epochs(mega_j, state, sched, z_rows, labels) * 1e3
        out["mega_ms_per_epoch"] = round(ms, 2)
        print(f"[probe] mega kernel: {ms:.2f} ms/epoch (chained)", flush=True)
    except Exception as exc:  # noqa: BLE001
        out["mega_compiles"] = False
        out["mega_error"] = f"{type(exc).__name__}: {str(exc)[:2000]}"
        print(f"[probe] mega kernel FAILED: {out['mega_error'][:500]}",
              flush=True)

    if not args.no_xla:
        # the production latent-cache XLA path (train/fused.py
        # make_fused_cached_epochs) on equivalent shapes, same protocol
        import dataclasses

        from flowerdiff.train.fused import make_fused_cached_epochs

        N, K = S * B, 8
        cfg_cache = dataclasses.replace(cfg, latent_cache=K)
        fused = make_fused_cached_epochs(model, cfg_cache,
                                         steps_per_epoch=S)
        z_pool = jax.random.normal(jax.random.key(3), (K, N, cfg.latent_dim))
        labels_all = jnp.arange(N, dtype=jnp.int32) % cfg.num_classes
        idx = jnp.arange(N, dtype=jnp.int32).reshape(S, B)
        offsets = jnp.arange(S, dtype=jnp.int32)

        def xla_epoch(st, sched_, _z, _lab, rng):
            r1, r2 = jax.random.split(rng)
            st, losses = fused(st, sched_, z_pool, labels_all, None,
                               idx, offsets, r1, r2)
            return st, losses

        try:
            ms_x = chain_epochs(xla_epoch, state, sched, z_rows, labels) * 1e3
            out["xla_cached_ms_per_epoch"] = round(ms_x, 2)
            print(f"[probe] XLA cached path: {ms_x:.2f} ms/epoch", flush=True)
        except Exception as exc:  # noqa: BLE001
            out["xla_error"] = f"{type(exc).__name__}: {str(exc)[:500]}"
            print(f"[probe] XLA path failed: {out['xla_error'][:300]}",
                  flush=True)

    print(json.dumps(out))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
