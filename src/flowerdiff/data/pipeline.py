"""On-device input pipeline.

The reference uses a host-side torchvision DataLoader with per-batch
`.to(device)` copies and PIL-based augmentation in python workers
(v1:24-35, 1303, 1061). TPU-first redesign (SURVEY.md §5.8): the whole
decoded 64x64 split is device-resident uint8 (the 1020-image train split is
~12 MB — it is device_put ONCE), and per-batch work is a single jitted
gather + augment + normalize on the accelerator. Host work per step is
generating an index slice, nothing else crosses PCIe.

Augmentations mirror the reference transform stack (v1:24-30):
  RandomHorizontalFlip, RandomRotation(10 deg, bilinear around the center,
  zero fill), ColorJitter(brightness=contrast=saturation=0.2). torchvision
  applies the three jitters in random order with factors ~ U[1-x, 1+x];
  we apply brightness -> contrast -> saturation in fixed order (documented
  deviation; the composition differs by O(x^2) terms only).
"""
from __future__ import annotations

import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _rotate_bilinear(img: jax.Array, angle: jax.Array) -> jax.Array:
    """Rotate one (H, W, C) image by `angle` radians about the center with
    bilinear sampling and zero fill (torchvision RandomRotation semantics)."""
    h, w = img.shape[0], img.shape[1]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # Inverse rotation: output pixel pulls from input coordinates.
    sx = cos * (xx - cx) + sin * (yy - cy) + cx
    sy = -sin * (xx - cx) + cos * (yy - cy) + cy

    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    dx, dy = sx - x0, sy - y0

    def gather(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = img[yi_c, xi_c]
        return vals * inside[..., None].astype(img.dtype)

    out = (
        gather(x0, y0) * ((1 - dx) * (1 - dy))[..., None]
        + gather(x0 + 1, y0) * (dx * (1 - dy))[..., None]
        + gather(x0, y0 + 1) * ((1 - dx) * dy)[..., None]
        + gather(x0 + 1, y0 + 1) * (dx * dy)[..., None]
    )
    return out


def _rotate_bilinear_batch(
    imgs: jax.Array, angles: jax.Array,
    precision=None,
) -> jax.Array:
    """Batched rotation, identical math to `_rotate_bilinear` but expressed
    as two einsum contractions instead of a 4-tap gather.

    The bilinear weight of source pixel (y', x') for an output pixel whose
    inverse-mapped sample point is (sy, sx) factors separably:
        w(y', x') = relu(1 - |sy - y'|) * relu(1 - |sx - x'|),
    and summing it over ALL in-range (y', x') reproduces the 4-tap gather
    exactly (taps outside the image get zero weight = zero fill). On TPU the
    gather lowers to a slow element-serialized path (~13 ms for a 64-image
    batch, measured); the two contractions run on the MXU in ~0.16 ms.

    Weights are built in f32. At the default (bf16-multiply) matmul
    precision pixel values match the gather form to ~4e-3 — invisible for
    augmentation, which is the only caller. Pass
    precision=jax.lax.Precision.HIGHEST for f32-roundoff parity
    (tests/test_data.py::test_rotate_batch_matches_gather; measured 5x
    slower on-chip).
    """
    h, w = imgs.shape[1], imgs.shape[2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    cos = jnp.cos(angles)[:, None, None]
    sin = jnp.sin(angles)[:, None, None]
    sx = cos * (xx - cx) + sin * (yy - cy) + cx  # (B, H, W)
    sy = -sin * (xx - cx) + cos * (yy - cy) + cy

    zz = jnp.arange(h, dtype=jnp.float32)  # source rows y'
    ww = jnp.arange(w, dtype=jnp.float32)  # source cols x'
    by = jax.nn.relu(1.0 - jnp.abs(sy[..., None] - zz))  # (B, H, W, H)
    ax = jax.nn.relu(1.0 - jnp.abs(sx[..., None] - ww))  # (B, H, W, W)

    # out[b,y,x,c] = sum_{z,w} by[b,y,x,z] * ax[b,y,x,w] * imgs[b,z,w,c]
    tmp = jnp.einsum("byxw,bzwc->byxzc", ax, imgs, precision=precision)
    return jnp.einsum("byxz,byxzc->byxc", by, tmp, precision=precision)


def _grayscale(img: jax.Array) -> jax.Array:
    weights = jnp.array([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * weights, axis=-1, keepdims=True)


def make_augment_fn(
    max_rotation_deg: float = 10.0,
    jitter: float = 0.2,
    flip: bool = True,
):
    """Jitted batch augmentation: (B,H,W,3) float [0,1] + key -> same shape."""

    def augment(images: jax.Array, rng: jax.Array) -> jax.Array:
        b = images.shape[0]
        k_flip, k_rot, k_b, k_c, k_s = jax.random.split(rng, 5)

        if flip:
            do_flip = jax.random.bernoulli(k_flip, 0.5, (b,))
            images = jnp.where(
                do_flip[:, None, None, None], images[:, :, ::-1, :], images
            )

        if max_rotation_deg > 0:
            angles = jax.random.uniform(
                k_rot, (b,),
                minval=-max_rotation_deg * jnp.pi / 180.0,
                maxval=max_rotation_deg * jnp.pi / 180.0,
            )
            images = _rotate_bilinear_batch(images, angles)

        if jitter > 0:
            fb = jax.random.uniform(k_b, (b, 1, 1, 1), minval=1 - jitter, maxval=1 + jitter)
            fc = jax.random.uniform(k_c, (b, 1, 1, 1), minval=1 - jitter, maxval=1 + jitter)
            fs = jax.random.uniform(k_s, (b, 1, 1, 1), minval=1 - jitter, maxval=1 + jitter)
            images = images * fb  # brightness
            gray_mean = jnp.mean(_grayscale(images), axis=(1, 2), keepdims=True)
            images = (images - gray_mean) * fc + gray_mean  # contrast
            gray = _grayscale(images)
            images = (images - gray) * fs + gray  # saturation
            images = jnp.clip(images, 0.0, 1.0)

        return images

    return augment


class DeviceDataset:
    """Device-resident dataset with jitted gather+augment batch assembly."""

    def __init__(
        self,
        images: np.ndarray,  # uint8 (N, H, W, 3)
        labels: np.ndarray,  # int (N,)
        colors: Optional[np.ndarray] = None,  # int (N,) for v3
        mesh: Optional[Mesh] = None,
        augment: bool = True,
        max_rotation_deg: float = 10.0,
        jitter: float = 0.2,
    ):
        self.mesh = mesh
        self.n = images.shape[0]
        sharding = None
        if mesh is not None:
            sharding = NamedSharding(mesh, P())  # replicated source array
        self.images = jax.device_put(jnp.asarray(images), sharding)
        self.labels = jax.device_put(jnp.asarray(labels, jnp.int32), sharding)
        self.colors = (
            jax.device_put(jnp.asarray(colors, jnp.int32), sharding)
            if colors is not None else None
        )
        # Augmentation policy is exposed so the fused-epoch path
        # (train/fused.py) can rebuild the identical augment program
        # inside its scan body.
        self.augment_enabled = augment
        self.max_rotation_deg = max_rotation_deg
        self.jitter = jitter
        self._augment = (
            make_augment_fn(max_rotation_deg, jitter) if augment else None
        )

        @jax.jit
        def assemble(indices: jax.Array, rng: jax.Array):
            imgs = jnp.take(self.images, indices, axis=0).astype(jnp.float32) / 255.0
            if self._augment is not None:
                imgs = self._augment(imgs, rng)
            labs = jnp.take(self.labels, indices, axis=0)
            if self.colors is not None:
                return imgs, labs, jnp.take(self.colors, indices, axis=0)
            return imgs, labs

        self._assemble = assemble

    def batches(
        self, rng: np.random.Generator | int, batch_size: int, shuffle: bool = True,
        drop_remainder: bool = True,
    ) -> Iterator[Tuple[jax.Array, ...]]:
        """One epoch of batches. Host work: a permutation and slicing."""
        if isinstance(rng, (int, np.integer)):
            rng = np.random.default_rng(int(rng))
        order = rng.permutation(self.n) if shuffle else np.arange(self.n)
        key = jax.random.key(int(rng.integers(0, 2**31)))
        end = self.n - (self.n % batch_size) if drop_remainder else self.n
        if end == 0:  # dataset smaller than one batch
            end = self.n
        for start in range(0, end, batch_size):
            idx = order[start:start + batch_size]
            if len(idx) < batch_size and drop_remainder:
                break
            batch = self._assemble(
                jnp.asarray(idx), jax.random.fold_in(key, start)
            )
            if self.mesh is not None:
                # Reshard batch over the 'data' axis so the jitted train step
                # sees DP inputs (gather/augment ran replicated — it is tiny).
                batch = tuple(
                    jax.device_put(
                        b, NamedSharding(self.mesh, P("data", *([None] * (b.ndim - 1))))
                    )
                    for b in batch
                )
            yield batch

    def full(self) -> Tuple[jax.Array, ...]:
        """The whole split, un-augmented float [0,1] (for eval/viz passes)."""
        imgs = self.images.astype(jnp.float32) / 255.0
        if self.colors is not None:
            return imgs, self.labels, self.colors
        return imgs, self.labels
