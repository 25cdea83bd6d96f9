#!/usr/bin/env python
"""Pretrain the perceptual backbone: a validated substitute for torchvision's
ImageNet VGG16 weights (v1/model_train_test.py:962-967), which cannot be
obtained in this zero-egress environment (no .pth cache exists anywhere on
the machine — searched round 2).

Trains the EXACT perceptual topology (models/vgg.py VGGFeatures, the VGG16
conv prefix through relu3_3) as a 102-class flower classifier on the
framework's synthetic flower distribution, with the same ImageNet-statistics
input normalization the perceptual criterion applies. The classifier head is
discarded; the conv filters become `src/flowerdiff/assets/vgg16_features16.npz`
(the same asset path tools/convert_vgg_weights.py would produce from real
torchvision weights — drop-in replaceable when egress exists).

Validation (printed + stored in the asset metadata):
  1. held-out classification accuracy (feature usefulness),
  2. perceptual-distance monotonicity under increasing distortion
     (noise & blur) — the property a perceptual loss must have,
  3. discrimination ratio (between-image distance / same-image-distorted
     distance), compared against the seeded-random-filter fallback.

Usage: python tools/pretrain_vgg.py [--epochs 12] [--n-train 6144] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

ASSET_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "src", "flowerdiff", "assets", "vgg16_features16.npz",
)


class _ClassifierHead(nn.Module):
    """GAP -> MLP head over VGGFeatures output; discarded after training."""

    num_classes: int = 102

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        h = feats.mean(axis=(1, 2))
        h = nn.relu(nn.Dense(256)(h))
        return nn.Dense(self.num_classes)(h)


def _normalize(x):
    from flowerdiff.models.vgg import IMAGENET_MEAN, IMAGENET_STD

    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def _augment(rng, images):
    """Light augmentation: horizontal flip + brightness jitter + noise."""
    n = images.shape[0]
    flip_rng, bright_rng, noise_rng = jax.random.split(rng, 3)
    flip = jax.random.bernoulli(flip_rng, 0.5, (n, 1, 1, 1))
    images = jnp.where(flip, images[:, :, ::-1, :], images)
    bright = jax.random.uniform(bright_rng, (n, 1, 1, 1), minval=0.85, maxval=1.15)
    images = jnp.clip(images * bright, 0.0, 1.0)
    noise = jax.random.normal(noise_rng, images.shape) * 0.01
    return jnp.clip(images + noise, 0.0, 1.0)


def train(epochs: int, n_train: int, n_val: int, batch: int, seed: int):
    from flowerdiff.data.synthetic import synthetic_flowers
    from flowerdiff.models.vgg import VGGFeatures

    images, labels = synthetic_flowers(n_train + n_val, 102, 64, seed=seed)
    images = jnp.asarray(images, jnp.float32) / 255.0
    labels = jnp.asarray(labels, jnp.int32)
    train_x, val_x = images[:n_train], images[n_train:]
    train_y, val_y = labels[:n_train], labels[n_train:]

    backbone = VGGFeatures()
    head = _ClassifierHead()
    rng = jax.random.key(seed)
    b_rng, h_rng = jax.random.split(rng)
    b_params = backbone.init(b_rng, jnp.zeros((1, 64, 64, 3)))
    h_params = head.init(h_rng, backbone.apply(b_params, jnp.zeros((1, 64, 64, 3))))
    params = {"backbone": b_params, "head": h_params}

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def loss_fn(params, x, y):
        feats = backbone.apply(params["backbone"], _normalize(x))
        logits = head.apply(params["head"], feats)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
        acc = (logits.argmax(-1) == y).mean()
        return loss, acc

    @jax.jit
    def step(params, opt_state, x, y, aug_rng):
        x = _augment(aug_rng, x)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    eval_fn = jax.jit(loss_fn)
    steps_per_epoch = n_train // batch
    ep_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        perm = ep_rng.permutation(n_train)
        losses, accs = [], []
        for i in range(steps_per_epoch):
            idx = perm[i * batch:(i + 1) * batch]
            params, opt_state, loss, acc = step(
                params, opt_state, train_x[idx], train_y[idx],
                jax.random.fold_in(jax.random.key(seed + 1), epoch * steps_per_epoch + i),
            )
            losses.append(loss)
            accs.append(acc)
        val_loss, val_acc = eval_fn(params, val_x, val_y)
        print(
            f"epoch {epoch + 1}/{epochs}: train loss "
            f"{float(jnp.stack(losses).mean()):.4f} acc {float(jnp.stack(accs).mean()):.3f} "
            f"| val loss {float(val_loss):.4f} acc {float(val_acc):.3f}"
        )
    return params["backbone"], float(val_acc), val_x


def validate_perceptual(b_params, val_x, tag: str):
    """Monotonicity + discrimination checks for a perceptual criterion built
    on the given backbone params. Returns (monotone_ok, discrimination)."""
    from flowerdiff.models.vgg import VGGPerceptual

    crit = VGGPerceptual(params=b_params, pretrained=True)
    x = val_x[:64]
    key = jax.random.key(0)

    # 1) distance grows with distortion strength (noise).
    noise = jax.random.normal(key, x.shape)
    sigmas = [0.02, 0.05, 0.1, 0.2, 0.4]
    dists = [float(crit(jnp.clip(x + s * noise, 0, 1), x)) for s in sigmas]
    monotone = all(d2 > d1 for d1, d2 in zip(dists, dists[1:]))

    # 2) discrimination: distance between DIFFERENT images vs the distance
    #    to a mildly distorted copy of the SAME image. A useful perceptual
    #    metric keeps these well separated.
    d_self = float(crit(jnp.clip(x + 0.05 * noise, 0, 1), x))
    d_other = float(crit(x, jnp.roll(x, 1, axis=0)))
    ratio = d_other / max(d_self, 1e-9)
    print(f"[{tag}] noise-dist curve {['%.3f' % d for d in dists]} "
          f"monotone={monotone} | self(σ=.05)={d_self:.3f} other={d_other:.3f} "
          f"discrimination={ratio:.2f}x")
    return monotone, ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--n-train", type=int, default=6144)
    ap.add_argument("--n-val", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=ASSET_PATH)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    print(f"devices: {jax.devices()}")

    b_params, val_acc, val_x = train(
        args.epochs, args.n_train, args.n_val, args.batch, args.seed
    )

    # Compare the trained backbone against the random-filter fallback.
    from flowerdiff.models.vgg import VGGFeatures, _VGG16_PREFIX

    rand_params = VGGFeatures().init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    mono_r, ratio_r = validate_perceptual(rand_params, val_x, "random-filters")
    mono_t, ratio_t = validate_perceptual(b_params, val_x, "trained")
    if not mono_t:
        raise SystemExit("trained backbone failed distance monotonicity — not saving")

    out = {}
    for item in _VGG16_PREFIX:
        if item == "P":
            continue
        _, name = item
        layer = b_params["params"][name]
        out[f"{name}_kernel"] = np.asarray(layer["kernel"], np.float32)
        out[f"{name}_bias"] = np.asarray(layer["bias"], np.float32)
    out["__source__"] = np.array(
        "self-trained flower classifier (synthetic 102-class set, zero-egress "
        "substitute for ImageNet VGG16; tools/pretrain_vgg.py)"
    )
    out["__val_accuracy__"] = np.float32(val_acc)
    out["__discrimination__"] = np.float32(ratio_t)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    size_mb = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size_mb:.1f} MB): val_acc={val_acc:.3f}, "
          f"discrimination trained {ratio_t:.2f}x vs random {ratio_r:.2f}x")


if __name__ == "__main__":
    main()
