"""Automatic color-label extraction (the v3 conditioning signal).

Parity targets (v3/model_train_test.py):
  - COLOR_CATEGORIES / COLOR_MAPPING taxonomy (v3:55-70): 10 colors; green
    and black are deliberately never returned (v3:109-112, 146-149).
  - extract_color_category (v3:178-277): Gaussian blur -> pixel filter
    (0.15 < brightness < 0.95, saturation > 0.1, relaxed if < 50 px) ->
    KMeans(k=5, seed 42, n_init 10) -> clusters ranked by size*(1+1.5*sat)
    -> HSV decision rules in rank order -> nearest-prototype fallback.
  - hsv_to_color_name rules (v3:105-159) and fallback_nearest_color
    (v3:162-175).
  - Flowers102WithColor-style precompute over the whole split (v3:376-410),
    here vectorized and CACHED to .npz (the reference recomputes with tqdm on
    every run, v3:386-393).

Everything is vectorized numpy (the reference does scalar python per pixel
cluster); HSV conversion and the rule cascade run on cluster centers only,
so the cost is the KMeans.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

COLOR_CATEGORIES = {
    "red": (255, 0, 0),
    "green": (0, 128, 0),
    "blue": (0, 0, 255),
    "yellow": (255, 255, 0),
    "orange": (255, 165, 0),
    "purple": (128, 0, 128),
    "pink": (255, 192, 203),
    "brown": (165, 42, 42),
    "white": (255, 255, 255),
    "black": (0, 0, 0),
}
COLOR_MAPPING = {name: i for i, name in enumerate(COLOR_CATEGORIES)}
COLOR_NAMES = list(COLOR_CATEGORIES)
_EXCLUDED = ("green", "black")  # v3:109-112


def rgb_to_hsv(r: float, g: float, b: float) -> Tuple[float, float, float]:
    """Scalar RGB [0,1] -> (h in [0,360), s, v in [0,1]) (v3:73-102)."""
    mx, mn = max(r, g, b), min(r, g, b)
    diff = mx - mn
    if diff < 1e-6:
        h = 0.0
    elif mx == r:
        h = (60 * ((g - b) / diff) + 360) % 360
    elif mx == g:
        h = (60 * ((b - r) / diff) + 120) % 360
    else:
        h = (60 * ((r - g) / diff) + 240) % 360
    v = mx
    s = 0.0 if mx < 1e-6 else diff / mx
    return h, s, v


def hsv_to_color_name(h: float, s: float, v: float) -> Optional[str]:
    """Hand-tuned HSV rule cascade (v3:105-159); never green/black; None
    triggers the nearest-prototype fallback."""
    if v > 0.85 and s < 0.2:
        return "white"
    if 10 <= h <= 40 and s <= 0.6 and v <= 0.6:
        return "brown"
    if (300 <= h < 360) or (0 <= h < 20):
        return "pink" if (v > 0.6 and s < 0.8) else "red"
    if (h < 20 or h > 340) and s > 0.2 and v > 0.2:
        return "red"
    if 20 <= h < 45 and s > 0.3 and v > 0.3:
        return "orange"
    if 45 <= h < 65 and s > 0.3 and v > 0.3:
        return "yellow"
    if 170 <= h < 250 and s > 0.2 and v > 0.2:
        return "blue"
    if 250 <= h < 310 and s > 0.2 and v > 0.2:
        return "purple"
    return None


def fallback_nearest_color(r255: float, g255: float, b255: float) -> str:
    """Nearest prototype by RGB L2, skipping green/black (v3:162-175)."""
    best, best_dist = None, np.inf
    probe = np.array([r255, g255, b255], np.float32)
    for name, rgb in COLOR_CATEGORIES.items():
        if name in _EXCLUDED:
            continue
        dist = float(np.linalg.norm(probe - np.asarray(rgb, np.float32)))
        if dist < best_dist:
            best, best_dist = name, dist
    return best


def _gaussian_blur(img: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Separable Gaussian blur matching PIL's GaussianBlur(radius=1) closely
    enough for cluster statistics (v3:187)."""
    sigma = radius
    size = int(3 * sigma) * 2 + 1
    xs = np.arange(size) - size // 2
    kernel = np.exp(-(xs**2) / (2 * sigma**2))
    kernel /= kernel.sum()
    out = img.astype(np.float32)
    out = np.apply_along_axis(lambda m: np.convolve(m, kernel, "same"), 0, out)
    out = np.apply_along_axis(lambda m: np.convolve(m, kernel, "same"), 1, out)
    return out


def extract_color_category(image: np.ndarray, k: int = 5) -> Tuple[str, int]:
    """KMeans + HSV classification of the dominant flower color
    (v3:178-277). `image` is (H, W, 3) uint8 or float [0,1]."""
    try:
        img = np.asarray(image)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=2)
        if img.shape[2] == 4:
            img = img[..., :3]
        img = _gaussian_blur(img)
        pixels = img.reshape(-1, 3).astype(np.float32)
        if pixels.max() > 1.0:
            pixels = pixels / 255.0

        brightness = pixels.mean(axis=1)
        max_c = pixels.max(axis=1)
        min_c = pixels.min(axis=1)
        saturation = (max_c - min_c) / np.maximum(max_c, 1e-6)
        mask = (brightness > 0.15) & (brightness < 0.95) & (saturation > 0.1)
        if mask.sum() < 50:  # relax the saturation filter (v3:222-224)
            mask = (brightness > 0.15) & (brightness < 0.95)
        filtered = pixels[mask]
        if len(filtered) < 10:
            return "unknown", -1

        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=k, random_state=42, n_init=10).fit(filtered)
        centers = km.cluster_centers_
        counts = np.bincount(km.labels_, minlength=k)

        c_max = centers.max(axis=1)
        c_min = centers.min(axis=1)
        c_sat = (c_max - c_min) / (c_max + 1e-6)
        weights = counts * (1.0 + 1.5 * c_sat)  # v3:236-245

        fallback_idx = None
        for idx in np.argsort(weights)[::-1]:
            name = hsv_to_color_name(*rgb_to_hsv(*centers[idx]))
            if name is not None:
                return name, COLOR_MAPPING[name]
            if fallback_idx is None:
                fallback_idx = idx
        if fallback_idx is not None:
            name = fallback_nearest_color(*(centers[fallback_idx] * 255))
            return name, COLOR_MAPPING[name]
        return "unknown", -1
    except Exception as exc:  # noqa: BLE001 — parity with v3:275-277
        print(f"Error in color extraction: {exc}")
        return "unknown", -1


def extract_color_labels_cached(
    images: np.ndarray,
    cache_path: Optional[str] = None,
    unknown_to: int = 8,  # map the reference's -1/unknown to 'white'
) -> Tuple[np.ndarray, list]:
    """Precompute color labels for a whole split with caching
    (replaces the per-run tqdm recompute, v3:386-393). Returns
    (labels int32 (N,), names list)."""
    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path, allow_pickle=True)
        if len(data["labels"]) == len(images):
            return data["labels"].astype(np.int32), list(data["names"])
    labels = np.empty((len(images),), np.int32)
    names = []
    for i, img in enumerate(images):
        name, idx = extract_color_category(img)
        labels[i] = idx if idx >= 0 else unknown_to
        names.append(name)
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez_compressed(cache_path, labels=labels, names=np.array(names))
    return labels, names
