"""Data-pipeline tests: synthetic dataset, on-device augmentation semantics,
DeviceDataset epoch mechanics, and the v3 color extractor on synthetic
swatches (SURVEY.md §4: 'color classifier on synthetic swatches')."""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.data import DeviceDataset, make_augment_fn, synthetic_flowers
from flowerdiff.data.color_labels import (
    COLOR_MAPPING,
    extract_color_category,
    extract_color_labels_cached,
    fallback_nearest_color,
    hsv_to_color_name,
    rgb_to_hsv,
)
from flowerdiff.data.pipeline import _rotate_bilinear, _rotate_bilinear_batch


def test_synthetic_shapes_and_determinism():
    images, labels = synthetic_flowers(32, 102, 64, seed=3)
    assert images.shape == (32, 64, 64, 3) and images.dtype == np.uint8
    assert labels.shape == (32,) and labels.dtype == np.int32
    images2, labels2 = synthetic_flowers(32, 102, 64, seed=3)
    np.testing.assert_array_equal(images, images2)
    np.testing.assert_array_equal(labels, labels2)


def test_rotate_zero_angle_is_identity():
    img = jax.random.uniform(jax.random.key(0), (16, 16, 3))
    out = _rotate_bilinear(img, jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_rotate_180_flips_both_axes():
    img = jax.random.uniform(jax.random.key(0), (17, 17, 3))  # odd => exact
    out = _rotate_bilinear(img, jnp.float32(np.pi))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(img)[::-1, ::-1], atol=1e-4
    )


def test_rotate_batch_matches_gather():
    """The einsum (MXU) rotation used by make_augment_fn reproduces the
    4-tap-gather reference implementation exactly (separable bilinear
    weights; zero fill = zero weight), across signs and magnitudes."""
    imgs = jax.random.uniform(jax.random.key(0), (5, 16, 16, 3))
    angles = jnp.array([-0.4, -0.05, 0.0, 0.17, 1.3], jnp.float32)
    per_image = jax.vmap(_rotate_bilinear)(imgs, angles)
    exact = _rotate_bilinear_batch(imgs, angles,
                                   precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(per_image), atol=1e-5
    )
    # The production path (default = bf16-multiply matmuls on TPU) only
    # needs augmentation-grade accuracy.
    fast = _rotate_bilinear_batch(imgs, angles)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(per_image), atol=2e-2
    )


def test_augment_preserves_shape_and_range():
    aug = make_augment_fn()
    imgs = jax.random.uniform(jax.random.key(0), (4, 64, 64, 3))
    out = aug(imgs, jax.random.key(1))
    assert out.shape == imgs.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_augment_is_rng_deterministic():
    aug = make_augment_fn()
    imgs = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    a = aug(imgs, jax.random.key(7))
    b = aug(imgs, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_dataset_epoch():
    images, labels = synthetic_flowers(40, 10, 32, seed=0)
    ds = DeviceDataset(images, labels, augment=False)
    batches = list(ds.batches(0, batch_size=16))
    assert len(batches) == 2  # drop remainder
    imgs, labs = batches[0]
    assert imgs.shape == (16, 32, 32, 3) and imgs.dtype == jnp.float32
    assert float(imgs.max()) <= 1.0
    # all indices across an epoch are distinct
    seen = np.concatenate([np.asarray(b[1]) for b in batches])
    assert len(seen) == 32


def test_device_dataset_with_colors():
    images, labels = synthetic_flowers(20, 10, 32, seed=0)
    colors = np.arange(20, dtype=np.int32) % 10
    ds = DeviceDataset(images, labels, colors=colors, augment=False)
    imgs, labs, cols = next(iter(ds.batches(0, 8)))
    assert cols.shape == (8,)


# ---- v3 color extraction ---- #

def test_rgb_to_hsv_matches_colorsys():
    import colorsys

    for rgb in [(1, 0, 0), (0.2, 0.7, 0.3), (0.5, 0.5, 0.5), (0.9, 0.1, 0.8)]:
        h, s, v = rgb_to_hsv(*rgb)
        ch, cs, cv = colorsys.rgb_to_hsv(*rgb)
        np.testing.assert_allclose([h / 360, s, v], [ch, cs, cv], atol=1e-6)


def test_hsv_rules_never_green_or_black():
    rng = np.random.default_rng(0)
    for _ in range(500):
        h, s, v = rng.uniform(0, 360), rng.uniform(), rng.uniform()
        name = hsv_to_color_name(h, s, v)
        assert name not in ("green", "black")


def test_fallback_skips_green_black():
    assert fallback_nearest_color(0, 120, 0) != "green"
    assert fallback_nearest_color(5, 5, 5) != "black"


def test_extract_color_on_synthetic_swatches():
    """Solid-color swatches (with slight noise) must classify correctly."""
    rng = np.random.default_rng(0)

    def swatch(rgb):
        base = np.ones((32, 32, 3), np.float32) * np.asarray(rgb, np.float32)
        noisy = np.clip(base + rng.normal(0, 0.02, base.shape), 0, 1)
        return (noisy * 255).astype(np.uint8)

    cases = {
        (0.9, 0.05, 0.05): "red",
        (0.95, 0.85, 0.1): "yellow",
        (0.1, 0.15, 0.9): "blue",
        (0.55, 0.1, 0.75): "purple",
    }
    for rgb, expected in cases.items():
        name, idx = extract_color_category(swatch(rgb))
        assert name == expected, (rgb, name)
        assert idx == COLOR_MAPPING[expected]


def test_color_labels_cache(tmp_path):
    images, _ = synthetic_flowers(6, 102, 32, seed=0)
    cache = str(tmp_path / "colors.npz")
    labels1, names1 = extract_color_labels_cached(images, cache)
    labels2, names2 = extract_color_labels_cached(images, cache)  # from cache
    np.testing.assert_array_equal(labels1, labels2)
    assert (labels1 >= 0).all() and (labels1 < 10).all()
