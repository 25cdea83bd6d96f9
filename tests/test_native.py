"""Native C++ JPEG ingest tests: builds the extension if the toolchain is
available, validates decode+resize against PIL, and the PIL fallback path."""
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_built():
    so = os.path.join(ROOT, "src", "flowerdiff", "native", "libflowerjpeg.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                [sys.executable, os.path.join(ROOT, "tools", "build_native.py")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as exc:  # pragma: no cover
            pytest.skip(f"native build unavailable: {exc}")
    return os.path.exists(so)


@pytest.fixture()
def jpeg_dir(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, (120 + 10 * i, 90 + 5 * i, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(arr).save(p, quality=92)
        paths.append(str(p))
    return paths


def test_native_decode_matches_pil(native_built, jpeg_dir):
    from flowerdiff.native import decode_jpeg_batch, native_available

    assert native_available() == native_built
    imgs, ok = decode_jpeg_batch(jpeg_dir, 48)
    assert imgs.shape == (6, 48, 48, 3) and imgs.dtype == np.uint8
    assert ok.all()

    pil = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((48, 48), Image.BICUBIC))
        for p in jpeg_dir
    ])
    diff = np.abs(imgs.astype(int) - pil.astype(int)).mean()
    # different decoders + DCT prescale: close but not bit-identical
    assert diff < 6.0, diff


def test_decode_reports_failures(native_built, tmp_path, jpeg_dir):
    from flowerdiff.native import decode_jpeg_batch

    bad = str(tmp_path / "not_a_jpeg.jpg")
    with open(bad, "wb") as fh:
        fh.write(b"garbage")
    imgs, ok = decode_jpeg_batch(jpeg_dir[:2] + [bad], 32)
    assert ok[0] and ok[1] and not ok[2]
    assert (imgs[2] == 0).all()
