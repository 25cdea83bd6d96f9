#!/usr/bin/env python
"""Serve a trained flowerdiff run over HTTP.

Loads the latest diffusion checkpoint from a finished run's results dir
(train-if-missing restore, same as the eval tools), builds the bucketed
SamplingService on the fastest available path (fused Pallas on TPU), and
exposes it via the coalescing HTTP front-end (serving_http.py).

Usage:
  python tools/serve.py --results_dir artifacts/demo_v1_cfg_1020 \
      --synthetic_size 1020 --port 8000 [--sampler ddim --ddim_steps 50] \
      [--guidance_scale 7.0] [--buckets 16,64,256]

Then:
  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/v1/sample \
      -d '{"classes": [4, 53], "n_per_class": 5}' > grid.png
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def add_service_args(ap: argparse.ArgumentParser) -> None:
    """Flags shared by serve.py and bench_serving.py (mirror
    serving.service_from_run's signature)."""
    ap.add_argument("--results_dir", required=True)
    ap.add_argument("--version", default="v1")
    ap.add_argument("--synthetic_size", type=int, default=1020)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cond_dropout", type=float, default=None,
                    help="must match the training run (affects param tree)")
    ap.add_argument("--ema_decay", type=float, default=None,
                    help="must match the training run; sampling uses EMA")
    ap.add_argument("--guidance_scale", type=float, default=None)
    ap.add_argument("--sampler", default="ancestral",
                    choices=["ancestral", "ddim"])
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--buckets", default=ap_default_buckets(),
                    help="bucket ladder; pixel presets (v4/v5) default to "
                         "4,16,64 unless overridden")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--no_quantize", action="store_true",
                    help="keep f32 device->host image transfers (default: "
                         "on-device uint8 quantization, 4x fewer D2H bytes)")
    ap.add_argument("--decode_bf16", action="store_true",
                    help="run the VAE decoder convs in bf16 (1.45x decode "
                         "on-chip, sub-quantization image error; "
                         "tests/test_bf16_resident.py::TestBF16Decode)")


def build_service(args):
    from flowerdiff.serving import pixel_service_from_run, service_from_run

    buckets = tuple(int(b) for b in args.buckets.split(","))
    quantize = not getattr(args, "no_quantize", False)
    if args.version in ("v4", "v5"):
        return pixel_service_from_run(
            args.results_dir, version=args.version, seed=args.seed,
            tiny=args.tiny, sampler_kind=args.sampler,
            ddim_steps=args.ddim_steps,
            buckets=buckets if args.buckets != ap_default_buckets()
            else (4, 16, 64),
            quantize_uint8=quantize,
        )
    return service_from_run(
        args.results_dir, version=args.version,
        synthetic_size=args.synthetic_size, seed=args.seed, tiny=args.tiny,
        cond_dropout=args.cond_dropout, ema_decay=args.ema_decay,
        guidance_scale=args.guidance_scale, sampler_kind=args.sampler,
        ddim_steps=args.ddim_steps, buckets=buckets,
        quantize_uint8=quantize,
        decode_bf16=getattr(args, "decode_bf16", False),
    )


def ap_default_buckets() -> str:
    return "8,16,32,64,128,256"


def main():
    ap = argparse.ArgumentParser()
    add_service_args(ap)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--max_batch", type=int, default=512)
    args = ap.parse_args()

    from flowerdiff.data.flowers102 import class_names
    from flowerdiff.serving_http import serve

    service = build_service(args)
    print(f"warming {len(service.buckets)} buckets on "
          f"{jax.default_backend()}...", flush=True)
    service.warmup(jax.random.key(args.seed + 99))

    names = class_names() if args.version not in ("v4", "v5") else None
    server = serve(service, jax.random.key(args.seed), host=args.host,
                   port=args.port, max_wait_ms=args.max_wait_ms,
                   max_batch=args.max_batch, verbose=True,
                   class_names=names)
    print(f"serving at http://{args.host}:{args.port} "
          f"(sampler={args.sampler}, buckets={service.buckets})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.batcher.stop()


if __name__ == "__main__":
    main()
