#!/usr/bin/env python
"""Real-Oxford-102 readiness drill (VERDICT r3 item 5).

This environment has no network egress, so no run has ever touched real
flower pixels — every demo uses the synthetic stand-in. This drill makes
real-data parity a ONE-COMMAND event for the day the three upstream files
exist (the reference's download contract, v1/model_train_test.py:1299 via
torchvision `datasets.Flowers102(download=True)`):

    python tools/real_data_drill.py \
        --tarball 102flowers.tgz --labels imagelabels.mat --setid setid.mat

Steps (each gated and reported):
  1. verify the three files against torchvision's published MD5s
     (torchvision.datasets.Flowers102._file_dict — the exact integrity
     contract the reference's download path enforces);
  2. stage them into the torchvision layout `<root>/flowers-102/{jpg/,
     imagelabels.mat, setid.mat}` that data/flowers102.py consumes as-is;
  3. ingest via flowerdiff.native.decode_jpeg_batch (the C++ libjpeg path
     when built) and sanity-check the split: 1020 train images, 102
     classes x 10, 6149 test;
  4. run a short v1 train + final sweep + quality report through the
     public CLI on the REAL pixels (--full for the reference schedule);
  5. diff the produced artifact names against the reference's v1 output
     contract and print the parity table.

A matching auto-skip integration test lives in tests/test_real_data.py
(`pytest -m realdata`). Known hashes are also tabled in MIGRATION.md.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import subprocess
import sys
import tarfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))

# torchvision.datasets.Flowers102._file_dict (the reference's integrity
# contract; torchvision 0.15+, stable since the dataset was added).
KNOWN_MD5 = {
    "102flowers.tgz": "52808999861908f626f3c1f4e79d11fa",
    "imagelabels.mat": "e0620be6f572b9609742df49c70aed4d",
    "setid.mat": "a5357ecc9cb78c4bef273ce3793fc85c",
}

# The reference's v1 output contract (v1/model_train_test.py save calls +
# the committed v1/output tree). {c} = class name, {e} = epoch.
REFERENCE_ARTIFACTS = [
    "autoencoder_losses.png",
    "vae_samples_grid_subset.png",
    "diffusion_loss.png",
    "denoising_path_{c}_final.png",
    "diffusion_animation_{c}_final.gif",
    "sample_class_{c}_epoch_{e}.png",
]


def md5(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()  # noqa: S324 — integrity check against published md5s
    with open(path, "rb") as fh:
        while True:
            b = fh.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def step(n: int, msg: str) -> None:
    print(f"\n[{n}] {msg}", flush=True)


def artifact_parity(produced: set[str], verbose: bool = False) -> list[str]:
    """Match produced artifact filenames against the reference's v1 output
    contract; return the unmatched patterns."""
    import re

    missing_names = []
    for pat in REFERENCE_ARTIFACTS:
        rx = re.compile("^" + re.escape(pat).replace(r"\{c\}", ".+")
                        .replace(r"\{e\}", r"\d+") + "$")
        hits = [f for f in produced if rx.match(f)]
        if not hits:
            missing_names.append(pat)
        if verbose:
            status = f"OK ({hits[0]})" if hits else "MISSING"
            print(f"    {pat:45s} {status}")
    return missing_names


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tarball", default="102flowers.tgz")
    ap.add_argument("--labels", default="imagelabels.mat")
    ap.add_argument("--setid", default="setid.mat")
    ap.add_argument("--root", default="./data",
                    help="dataset root (torchvision layout is created here)")
    ap.add_argument("--out", default="artifacts/real_data_drill")
    ap.add_argument("--full", action="store_true",
                    help="reference schedule (1200 VAE + 10000 diffusion "
                         "epochs) instead of the short readiness run")
    ap.add_argument("--skip-hash", action="store_true",
                    help="stage/train even if hashes mismatch (report only)")
    args = ap.parse_args()

    files = {"102flowers.tgz": args.tarball,
             "imagelabels.mat": args.labels,
             "setid.mat": args.setid}
    missing = [p for p in files.values() if not os.path.exists(p)]
    if missing:
        print("real-data drill: missing input files:", ", ".join(missing))
        print("Obtain them from the Oxford VGG page (URLs in "
              "data/flowers102.py DOWNLOAD_URLS) and re-run.")
        return 2

    step(1, "verifying integrity against torchvision's published MD5s")
    ok = True
    for canon, path in files.items():
        got, want = md5(path), KNOWN_MD5[canon]
        match = "OK" if got == want else "MISMATCH"
        ok &= got == want
        print(f"    {canon:18s} md5 {got}  expected {want}  {match}")
    if not ok and not args.skip_hash:
        print("hash mismatch — refusing to stage (use --skip-hash to force)")
        return 1

    step(2, f"staging torchvision layout under {args.root}/flowers-102")
    base = os.path.join(args.root, "flowers-102")
    os.makedirs(base, exist_ok=True)
    if not os.path.isdir(os.path.join(base, "jpg")):
        with tarfile.open(args.tarball) as tar:
            tar.extractall(base)  # noqa: S202 — hash-verified archive
    for canon, path in (("imagelabels.mat", args.labels),
                        ("setid.mat", args.setid)):
        dest = os.path.join(base, canon)
        if os.path.abspath(path) != os.path.abspath(dest):
            shutil.copyfile(path, dest)
    n_jpg = len([f for f in os.listdir(os.path.join(base, "jpg"))
                 if f.endswith(".jpg")])
    print(f"    jpg/: {n_jpg} images (expect 8189)")

    step(3, "ingesting splits (native decoder when built; cached to .npz)")
    import numpy as np

    from flowerdiff.data.flowers102 import load_flowers102

    train_x, train_y = load_flowers102(args.root, "train")
    test_x, test_y = load_flowers102(args.root, "test")
    counts = np.bincount(train_y, minlength=102)
    print(f"    train: {train_x.shape} labels {train_y.shape} "
          f"({counts.min()}-{counts.max()} per class over "
          f"{(counts > 0).sum()} classes)")
    print(f"    test:  {test_x.shape}")
    assert train_x.shape[0] == 1020, f"train split {train_x.shape[0]} != 1020"
    assert (counts == 10).all(), "train split is not 10 images/class"
    assert test_x.shape[0] == 6149, f"test split {test_x.shape[0]} != 6149"
    assert train_x.dtype == np.uint8 and train_x.shape[1:] == (64, 64, 3)

    step(4, "short v1 train + final sweep + quality report on REAL pixels")
    vae_epochs = "1200" if args.full else "120"
    total_epochs = "10000" if args.full else "300"
    cmd = [sys.executable, os.path.join(REPO, "main.py"),
           "--version", "v1", "--dataset", "flowers102",
           "--data_root", args.root,
           "--vae_epochs", vae_epochs, "--total_epochs", total_epochs,
           "--seed", "42", "--cond_dropout", "0.1", "--ema_decay", "0.999",
           "--no-cadence-viz", "--results_dir", args.out]
    print("    " + " ".join(cmd))
    rc = subprocess.call(cmd)
    if rc != 0:
        print(f"training run failed (exit {rc})")
        return rc

    step(5, "artifact-name parity vs the reference v1 output contract")
    produced = set(os.listdir(args.out))
    missing_names = artifact_parity(produced, verbose=True)
    qual = os.path.join(args.out, "sample_quality.jsonl")
    if os.path.exists(qual):
        print("\nquality report rows:")
        with open(qual) as fh:
            for line in fh:
                print("    " + line.rstrip())
    if missing_names:
        print(f"\nDRILL INCOMPLETE: {len(missing_names)} artifact name(s) "
              f"missing: {missing_names}")
        return 1
    print("\nDRILL PASSED: real-data pipeline end-to-end on Oxford-102.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
