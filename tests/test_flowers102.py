"""Flowers102 loader tests against a synthesized torchvision-layout dataset
(SURVEY.md §7.3(4): exact dataset/split parity): .mat split indices, 0-based
label mapping, npz caching, and the native/PIL decode path."""
import os

import numpy as np
import pytest
import scipy.io
from PIL import Image

from flowerdiff.data.flowers102 import FLOWERS102_SPLITS, class_names, load_flowers102


@pytest.fixture()
def fake_flowers_root(tmp_path):
    """Tiny dataset in exact torchvision layout: 12 jpgs, 1-based labels,
    train/val/test id splits."""
    base = tmp_path / "flowers-102"
    jpg = base / "jpg"
    jpg.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 12
    for i in range(1, n + 1):
        arr = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        # encode the image id into the top-left pixel block for identity checks
        arr[:8, :8] = (i * 20) % 255
        Image.fromarray(arr).save(jpg / f"image_{i:05d}.jpg", quality=95)
    labels = (np.arange(n) % 5) + 1  # 1-based, like the real imagelabels.mat
    scipy.io.savemat(base / "imagelabels.mat", {"labels": labels[None, :]})
    scipy.io.savemat(
        base / "setid.mat",
        {
            "trnid": np.array([[1, 4, 7, 10]]),
            "valid": np.array([[2, 5, 8]]),
            "tstid": np.array([[3, 6, 9, 11, 12]]),
        },
    )
    return str(tmp_path)


def test_split_indices_and_labels(fake_flowers_root):
    imgs, labs = load_flowers102(fake_flowers_root, "train", img_size=32,
                                 cache=False)
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.uint8
    # trnid = [1,4,7,10] -> 0-based labels of those ids
    expected = np.array([(i - 1) % 5 for i in (1, 4, 7, 10)], np.int32)
    np.testing.assert_array_equal(labs, expected)

    _, val_labs = load_flowers102(fake_flowers_root, "val", img_size=32,
                                  cache=False)
    assert len(val_labs) == 3
    _, test_labs = load_flowers102(fake_flowers_root, "test", img_size=32,
                                   cache=False)
    assert len(test_labs) == 5


def test_image_content_follows_split_order(fake_flowers_root):
    imgs, _ = load_flowers102(fake_flowers_root, "train", img_size=32,
                              cache=False)
    # image id i has its (i*20)%255 marker block; ids [1,4,7,10]
    for row, image_id in enumerate((1, 4, 7, 10)):
        marker = (image_id * 20) % 255
        got = float(imgs[row, :3, :3].mean())
        assert abs(got - marker) < 30, (image_id, got, marker)


def test_npz_cache_roundtrip(fake_flowers_root):
    imgs1, labs1 = load_flowers102(fake_flowers_root, "train", img_size=32,
                                   cache=True)
    cache = os.path.join(fake_flowers_root, "flowers-102", "cache_train_32.npz")
    assert os.path.exists(cache)
    imgs2, labs2 = load_flowers102(fake_flowers_root, "train", img_size=32,
                                   cache=True)
    np.testing.assert_array_equal(imgs1, imgs2)
    np.testing.assert_array_equal(labs1, labs2)


def test_missing_dataset_raises():
    with pytest.raises(FileNotFoundError, match="synthetic"):
        load_flowers102("/nonexistent/path", "train")


def test_class_names_reference_fallback():
    names = class_names()
    assert names == [str(i) for i in range(102)]  # v1:1302 behavior
    assert len(FLOWERS102_SPLITS) == 3
