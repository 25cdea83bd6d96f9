#!/usr/bin/env python
"""End-to-end HTTP serving benchmark: quantify the coalescing win.

Spins up the real stack (SamplingService -> CoalescingBatcher ->
ThreadingHTTPServer on an ephemeral port), fires real HTTP clients at it,
and reports images/sec for three modes:

  device   one direct `service.sample` call with all rows — the device-side
           ceiling (no HTTP, no queuing).
  serial   one HTTP client issuing small requests back-to-back — every
           request pays its own dispatch (the no-coalescing floor).
  burst    `--clients` concurrent HTTP threads, each issuing
           `--requests_per_client` small requests — arrivals inside one
           dispatch window merge into shared bucketed dispatches.

The interesting number is burst/serial: how much of the large-batch
sampler's throughput (BASELINE.md roofline) batch-1 clients recover purely
through request coalescing. Output: one JSON line (plus a breakdown table).

Usage:
  python tools/bench_serving.py --results_dir artifacts/serving_smoke/run \
      --cond_dropout 0.1 --guidance_scale 7.0 \
      --clients 16 --requests_per_client 4 --rows_per_request 2
"""
from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from serve import add_service_args, build_service  # noqa: E402


def _connect(port: int, timeout: float = 600.0):
    return http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)


def _post(conn, body: dict):
    """POST on a persistent HTTP/1.1 connection (the server keeps it open)."""
    conn.request("POST", "/v1/sample", body=json.dumps(body),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    assert resp.status == 200, (resp.status, data[:200])
    return data


def main():
    ap = argparse.ArgumentParser()
    add_service_args(ap)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests_per_client", type=int, default=4)
    ap.add_argument("--rows_per_request", type=int, default=2)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--format", default="npy", choices=["npy", "json"])
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    from flowerdiff.serving_http import serve

    service = build_service(args)
    num_classes = service.model.num_classes
    print(f"warming {len(service.buckets)} buckets on "
          f"{jax.default_backend()}...", flush=True)
    service.warmup(jax.random.key(args.seed + 99))

    server = serve(service, jax.random.key(args.seed), host="127.0.0.1",
                   port=0, max_wait_ms=args.max_wait_ms)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    rows = args.rows_per_request
    n_requests = args.clients * args.requests_per_client
    total_rows = n_requests * rows

    try:
        # --- device ceiling: one direct call with every row ---------------
        # The timed call folds the key: the axon relay memoizes identical
        # execute requests, so re-timing the warm call's exact arguments
        # reports transfer-free fantasy numbers.
        classes = jax.numpy.arange(total_rows, dtype=jax.numpy.int32) \
            % num_classes
        key = jax.random.key(7)
        service.sample(classes, key)  # warm the exact request plan
        t0 = time.perf_counter()
        service.sample(classes, jax.random.fold_in(key, 1))
        device_s = time.perf_counter() - t0

        # breakdown: sampling-only ceiling (no decode, no image D2H)
        service.sample_latents(classes, key)
        t0 = time.perf_counter()
        service.sample_latents(classes, jax.random.fold_in(key, 2))
        latents_s = time.perf_counter() - t0

        # --- serial floor: one client, back-to-back small requests --------
        body = {"classes": list(range(rows)), "format": args.format}
        conn = _connect(port)
        _post(conn, body)  # warm the small bucket end-to-end
        t0 = time.perf_counter()
        for _ in range(min(n_requests, 32)):  # enough for a stable mean
            _post(conn, body)
        serial_s = (time.perf_counter() - t0) / min(n_requests, 32) \
            * n_requests
        conn.close()

        # --- concurrent burst: the coalescing path -------------------------
        server.batcher.stats.update(requests=0, images=0, dispatches=0,
                                    max_coalesced=0, errors=0)
        errs = []

        def client(i):
            try:
                b = {"classes": [(i * rows + j) % num_classes
                                 for j in range(rows)],
                     "format": args.format}
                conn = _connect(port)
                for _ in range(args.requests_per_client):
                    _post(conn, b)
                conn.close()
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        burst_s = time.perf_counter() - t0
        assert not errs, errs[:3]
        stats = dict(server.batcher.stats)
    finally:
        server.shutdown()
        server.batcher.stop()

    result = {
        "metric": "HTTP serving throughput (coalesced burst, "
                  f"{args.clients}x{args.requests_per_client} reqs x "
                  f"{rows} rows, {args.sampler})",
        "value": round(total_rows / burst_s, 2),
        "unit": "images/sec",
        "device_ceiling_img_s": round(total_rows / device_s, 2),
        "latents_only_ceiling_img_s": round(total_rows / latents_s, 2),
        "quantize_uint8": bool(getattr(service, "quantize_uint8", False)),
        "serial_http_img_s": round(total_rows / serial_s, 2),
        "coalescing_speedup_vs_serial": round(serial_s / burst_s, 2),
        "fraction_of_device_ceiling": round(device_s / burst_s, 4),
        "dispatches": stats["dispatches"],
        "requests": stats["requests"],
        "max_coalesced": stats["max_coalesced"],
        "backend": jax.default_backend(),
    }
    print(f"device ceiling : {result['device_ceiling_img_s']:>10.1f} img/s "
          f"({total_rows} rows, one dispatch)")
    print(f"serial HTTP    : {result['serial_http_img_s']:>10.1f} img/s "
          f"({n_requests} x {rows}-row requests, no concurrency)")
    print(f"coalesced burst: {result['value']:>10.1f} img/s "
          f"({stats['requests']} reqs -> {stats['dispatches']} dispatches, "
          f"max {stats['max_coalesced']} merged)")
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
