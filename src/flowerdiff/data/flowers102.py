"""Oxford 102 Flowers dataset loader with torchvision split parity.

Parity target: the reference builds `datasets.Flowers102(root, split,
download=True)` (v1:1299, v4:28-29). torchvision's layout is
    <root>/flowers-102/jpg/image_{05d}.jpg
    <root>/flowers-102/imagelabels.mat   (1-based labels, length 8189)
    <root>/flowers-102/setid.mat         ('trnid'/'valid'/'tstid', 1-based ids)
and its 'train' split is setid['trnid'] (1020 images), 'val' is 'valid',
'test' is 'tstid' (6149). Labels are mapped to 0-based.

We parse the same .mat files (scipy.io) and produce identical index sets, so
a dataset directory downloaded by torchvision is consumed as-is. Images are
decoded and bicubic-resized to (img_size, img_size) with PIL — matching the
reference transform `Resize((64,64))` (v1:24-35) — once, then cached to a
compressed .npz so subsequent runs skip JPEG decode entirely and the whole
split can be device_put in one transfer (TPU-first: the 64x64 train split is
~12 MB — it lives in HBM for the entire run).

Class names: torchvision's Flowers102 exposes no `.classes`; the reference
falls back to `[str(i) for i in range(102)]` (v1:1302). We do the same.

Download URLs are recorded for completeness but this environment has no
egress; absent data raises a clear error pointing at the synthetic fallback.
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np

FLOWERS102_SPLITS = {"train": "trnid", "val": "valid", "test": "tstid"}

DOWNLOAD_URLS = {
    "images": "https://www.robots.ox.ac.uk/~vgg/data/flowers/102/102flowers.tgz",
    "labels": "https://www.robots.ox.ac.uk/~vgg/data/flowers/102/imagelabels.mat",
    "setid": "https://www.robots.ox.ac.uk/~vgg/data/flowers/102/setid.mat",
}


def class_names() -> list[str]:
    """Reference behavior: no names in torchvision -> stringified indices
    (v1:1302)."""
    return [str(i) for i in range(102)]


def _dataset_dir(root: str) -> str:
    return os.path.join(root, "flowers-102")


def load_flowers102(
    root: str = "./data",
    split: str = "train",
    img_size: int = 64,
    cache: bool = True,
    download: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (images uint8 (N, S, S, 3), labels int32 (N,)) for a split."""
    base = _dataset_dir(root)
    cache_path = os.path.join(base, f"cache_{split}_{img_size}.npz")
    if cache and os.path.exists(cache_path):
        data = np.load(cache_path)
        return data["images"], data["labels"]

    jpg_dir = os.path.join(base, "jpg")
    labels_mat = os.path.join(base, "imagelabels.mat")
    setid_mat = os.path.join(base, "setid.mat")
    if not (os.path.isdir(jpg_dir) and os.path.exists(labels_mat) and os.path.exists(setid_mat)):
        if download:
            _download(base)
        else:
            raise FileNotFoundError(
                f"Flowers102 not found under {base}. Expected torchvision layout "
                f"(jpg/, imagelabels.mat, setid.mat). This environment has no "
                f"network egress; use flowerdiff.data.synthetic_flowers for "
                f"offline runs, or place the dataset there manually."
            )

    import scipy.io

    labels_all = scipy.io.loadmat(labels_mat)["labels"].ravel().astype(np.int64) - 1
    ids = scipy.io.loadmat(setid_mat)[FLOWERS102_SPLITS[split]].ravel().astype(np.int64)
    paths = [os.path.join(jpg_dir, f"image_{image_id:05d}.jpg") for image_id in ids]
    labels = labels_all[ids - 1].astype(np.int32)

    # One-time ingest: the native multithreaded libjpeg decoder when built
    # (tools/build_native.py), PIL otherwise — identical output layout.
    from flowerdiff.native import decode_jpeg_batch

    images, ok = decode_jpeg_batch(paths, img_size)
    if not ok.all():
        bad = [paths[i] for i in np.nonzero(~ok)[0][:3]]
        raise IOError(f"failed to decode {int((~ok).sum())} images, e.g. {bad}")

    if cache:
        os.makedirs(base, exist_ok=True)
        np.savez_compressed(cache_path, images=images, labels=labels)
    return images, labels


def _download(base: str) -> None:
    import tarfile
    import urllib.request

    os.makedirs(base, exist_ok=True)
    for key, url in DOWNLOAD_URLS.items():
        dest = os.path.join(base, os.path.basename(url))
        if not os.path.exists(dest):
            urllib.request.urlretrieve(url, dest)  # noqa: S310
        if key == "images":
            with tarfile.open(dest) as tar:
                tar.extractall(base)  # noqa: S202
