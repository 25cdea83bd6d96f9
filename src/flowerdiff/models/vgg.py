"""VGG16 feature extractor for the perceptual loss.

Parity target: VGGPerceptualLoss (v1/model_train_test.py:962-981) — frozen
torchvision `vgg16(pretrained=True).features[:16]` (through relu3_3), inputs
normalized with ImageNet mean/std, euclidean distance between feature maps.

This is a from-scratch Flax re-implementation of that prefix:
  conv3-64, conv3-64, maxpool2, conv3-128, conv3-128, maxpool2,
  conv3-256, conv3-256, conv3-256           (ReLU after every conv)

Pretrained weights: this environment has no network egress and no torchvision
weight cache anywhere on the machine, so the shipped asset
`assets/vgg16_features16.npz` is a VALIDATED SUBSTITUTE: the same topology
pretrained as a 102-class flower classifier by tools/pretrain_vgg.py, with
distance-monotonicity and discrimination checks recorded in its metadata
(`__source__`, `__val_accuracy__`, `__discrimination__`). On a machine with
the real torchvision checkpoint, tools/convert_vgg_weights.py produces a
drop-in replacement at the same path. When no asset exists at all, the
extractor falls back to FIXED seeded random filters — a random-projection
perceptual loss; the fallback is reported (`source="random-filters"`) so runs
are never silently non-comparable. Path override: FLOWERDIFF_VGG_WEIGHTS.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flowerdiff.losses.distances import euclidean_distance_loss

# (channels, layer_name) per conv in features[:16]; 'P' marks a 2x2 maxpool.
_VGG16_PREFIX = [
    (64, "conv1_1"), (64, "conv1_2"), "P",
    (128, "conv2_1"), (128, "conv2_2"), "P",
    (256, "conv3_1"), (256, "conv3_2"), (256, "conv3_3"),
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

DEFAULT_WEIGHTS_PATH = os.environ.get(
    "FLOWERDIFF_VGG_WEIGHTS",
    os.path.join(os.path.dirname(__file__), "..", "assets", "vgg16_features16.npz"),
)


class VGGFeatures(nn.Module):
    """VGG16 features[:16] (through relu3_3), NHWC.

    `dtype` is the compute dtype (params stay f32): the backbone is frozen,
    so bf16 activations are a pure bandwidth/MXU win for the training-loss
    path — the feature DISTANCE is still accumulated in f32
    (losses/distances.py). Eval/quality tools keep the f32 default.
    """

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        for item in _VGG16_PREFIX:
            if item == "P":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                ch, name = item
                h = nn.Conv(ch, (3, 3), padding="SAME", name=name,
                            dtype=self.dtype)(h)
                h = nn.relu(h)
        return h


def load_vgg_params(path: Optional[str] = None, rng_seed: int = 0):
    """Load pretrained perceptual weights, or seeded random fallback params.

    Returns (params, pretrained: bool). The .npz layout is
    {name}_kernel: (3,3,in,out) NHWC-ready, {name}_bias: (out,), plus
    optional `__source__` provenance metadata (exposed via
    `describe_vgg_weights`).
    """
    path = path or DEFAULT_WEIGHTS_PATH
    model = VGGFeatures()
    if path and os.path.exists(path):
        data = np.load(path)
        params = {"params": {}}
        for item in _VGG16_PREFIX:
            if item == "P":
                continue
            _, name = item
            params["params"][name] = {
                "kernel": jnp.asarray(data[f"{name}_kernel"]),
                "bias": jnp.asarray(data[f"{name}_bias"]),
            }
        return params, True
    # Jitted: eager flax init dispatches one tiny program per op, each a
    # slow server-side compile on the tunneled runtime (train/vae_gan.py
    # create_vae_gan_state has the measurements).
    params = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3), jnp.float32))
    )(jax.random.key(rng_seed))
    return params, False


def describe_vgg_weights(path: Optional[str] = None) -> str:
    """Provenance of the active perceptual weights (asset `__source__`
    metadata, or 'random-filters' when no asset exists)."""
    path = path or DEFAULT_WEIGHTS_PATH
    if path and os.path.exists(path):
        data = np.load(path)
        if "__source__" in data:
            return str(data["__source__"])
        return f"converted asset at {path}"
    return "random-filters"


class VGGPerceptual:
    """Frozen perceptual criterion (v1:962-981): normalize both images with
    ImageNet statistics, run the feature prefix, euclidean feature distance.
    """

    def __init__(self, params=None, pretrained: Optional[bool] = None):
        if params is None:
            params, pretrained = load_vgg_params()
        self.params = params
        self.pretrained = bool(pretrained)
        self._model = VGGFeatures()

    def features(self, x: jax.Array) -> jax.Array:
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        return self._model.apply(self.params, (x - mean) / std)

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return euclidean_distance_loss(self.features(x), self.features(y))
