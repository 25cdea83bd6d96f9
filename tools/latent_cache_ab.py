#!/usr/bin/env python
"""Latent-cache quality A/B with a committed evidence trail (VERDICT r4
item 2: the round-4 A/B cited /root/runs/ab_*/guidance_ab.json, which never
entered the tree).

Three diffusion arms off ONE shared VAE (the flagship recipe:
cond_dropout 0.1, EMA 0.999), each trained for --epochs epochs through the
public CLI, then evaluated with tools/guidance_eval.py at the pinned
guidance scale(s):

  fresh      per-step frozen-VAE encode every epoch (reference semantics,
             v1:1340-1405 — the train_conditional_diffusion loop re-encodes
             each batch)
  cache_r50  latent_cache=8 refreshed every 50 epochs (flagship default)
  cache_never latent_cache=8, never refreshed

The shared VAE comes from a finished run's ckpt_vae (copied, not symlinked,
so the arms stay self-contained). Per-arm train wall time is read from the
runner's `[stage latent_ddpm]` clock line (runner._StageClock).

Usage:
  python tools/latent_cache_ab.py --vae_from artifacts/flagship_r5/run \
      --epochs 2000 --scales 7 --json artifacts/latent_cache_ab_r5.json
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = {
    "fresh": ["--latent_cache", "0"],
    "cache_r50": ["--latent_cache", "8", "--cache_refresh_epochs", "50"],
    "cache_never": ["--latent_cache", "8", "--cache_refresh_epochs", "0"],
}


def run_logged(cmd, log_path):
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, cwd=REPO, stdout=log,
                              stderr=subprocess.STDOUT)
    assert proc.returncode == 0, (cmd, log_path)
    with open(log_path) as f:
        return f.read()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vae_from", default="artifacts/flagship_r5/run",
                    help="finished run whose ckpt_vae all arms share")
    ap.add_argument("--out_root", default="/tmp/latent_cache_ab")
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--synthetic_size", type=int, default=1020)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--scales", default="7")
    ap.add_argument("--json", default="artifacts/latent_cache_ab_r5.json")
    args = ap.parse_args()

    src_vae = os.path.join(REPO, args.vae_from, "ckpt_vae")
    assert os.path.isdir(src_vae), f"no ckpt_vae under {args.vae_from}"

    results = {"vae_from": args.vae_from, "epochs": args.epochs,
               "scales": args.scales, "arms": {}}
    for arm, extra in ARMS.items():
        arm_dir = os.path.join(args.out_root, arm)
        if os.path.isdir(arm_dir):
            shutil.rmtree(arm_dir)
        os.makedirs(arm_dir)
        shutil.copytree(src_vae, os.path.join(arm_dir, "ckpt_vae"))

        t0 = time.time()
        log = run_logged(
            [sys.executable, "main.py", "--version", "flagship",
             "--dataset", "synthetic",
             "--synthetic_size", str(args.synthetic_size),
             "--seed", str(args.seed),
             "--total_epochs", str(args.epochs),
             "--checkpoint_every", str(args.epochs),
             "--no-cadence-viz", "--no-final-sweep",
             "--results_dir", arm_dir] + extra,
            os.path.join(arm_dir, "train.log"))
        train_s = time.time() - t0
        m = re.search(r"\[stage latent_ddpm\] ([0-9.]+)s total:.*?"
                      r"dispatch ([0-9.]+)s", log)
        stage_s = float(m.group(1)) if m else None
        dispatch_s = float(m.group(2)) if m else None

        ge_json = os.path.join(arm_dir, "guidance_ab.json")
        run_logged(
            [sys.executable, "tools/guidance_eval.py",
             "--results_dir", arm_dir, "--version", "flagship",
             "--synthetic_size", str(args.synthetic_size),
             "--ema_decay", "0.999", "--cond_dropout", "0.1",
             "--scales", args.scales, "--ddim_steps", "0",
             "--json", ge_json],
            os.path.join(arm_dir, "eval.log"))
        with open(ge_json) as f:
            evals = json.load(f)

        results["arms"][arm] = {
            "cli_extra": extra,
            "train_wall_s": round(train_s, 1),
            "latent_stage_s": stage_s,
            "latent_dispatch_s": dispatch_s,
            "ms_per_epoch": (round(dispatch_s / args.epochs * 1000, 2)
                             if dispatch_s else None),
            "eval": evals,
        }
        print(f"[{arm}] stage {stage_s}s "
              f"({results['arms'][arm]['ms_per_epoch']} ms/epoch)",
              flush=True)

    out = os.path.join(REPO, args.json)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
