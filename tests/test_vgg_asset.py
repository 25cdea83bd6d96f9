"""Perceptual-weight asset contract (VERDICT r1 item 1): the default config's
perceptual term must run on pretrained (validated-substitute) filters, not
seeded-random ones. Reference: VGGPerceptualLoss loads
`vgg16(pretrained=True).features[:16]` (v1/model_train_test.py:962-967)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowerdiff.models.vgg import (
    DEFAULT_WEIGHTS_PATH,
    VGGPerceptual,
    describe_vgg_weights,
    load_vgg_params,
)

ASSET_EXISTS = os.path.exists(DEFAULT_WEIGHTS_PATH)


@pytest.mark.skipif(not ASSET_EXISTS, reason="vgg asset not built")
def test_asset_loads_pretrained_with_provenance():
    params, pretrained = load_vgg_params()
    assert pretrained is True
    src = describe_vgg_weights()
    assert "random-filters" not in src and len(src) > 10
    # metadata carries the validation numbers
    data = np.load(DEFAULT_WEIGHTS_PATH)
    assert float(data["__discrimination__"]) > 10.0  # random filters: ~3.8x
    assert float(data["__val_accuracy__"]) > 0.5  # 102-class, chance ~0.01


@pytest.mark.skipif(not ASSET_EXISTS, reason="vgg asset not built")
def test_asset_perceptual_distance_monotone_under_noise():
    crit = VGGPerceptual()
    assert crit.pretrained
    x = jax.random.uniform(jax.random.key(0), (8, 64, 64, 3))
    noise = jax.random.normal(jax.random.key(1), x.shape)
    prev = 0.0
    for sigma in (0.05, 0.15, 0.35):
        d = float(crit(jnp.clip(x + sigma * noise, 0, 1), x))
        assert d > prev
        prev = d


def test_random_fallback_is_reported():
    params, pretrained = load_vgg_params(path="/nonexistent/weights.npz")
    assert pretrained is False
    assert describe_vgg_weights("/nonexistent/weights.npz") == "random-filters"
