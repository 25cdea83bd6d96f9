"""bf16-resident activation path (VERDICT r3 item 7).

The "bf16" VAE-GAN step previously still carried f32 HBM traffic in two
places: LayerNorm2d's autodiff residuals (the full-size f32 normalized
tensor) and the ENTIRE frozen VGG perceptual backbone (models/vgg.py had no
compute dtype). These tests pin the numerics of the resident replacements:

  - core/layers.py::_ln2d_resident — custom-vjp LayerNorm2d whose one big
    saved residual is the bf16 normalized tensor; backward re-derived as
    dx = rsigma * (g - mean(g) - xn * mean(g*xn)).
  - models/vgg.py::VGGFeatures(dtype=bf16) — frozen backbone in bf16 with
    the feature distance still accumulated in f32 (losses/distances.py).

Reference semantics being preserved: LayerNorm2d v1/model_train_test.py:
144-156, VGGPerceptualLoss v1:962-981.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowerdiff.core.layers import LayerNorm2d, _ln2d_resident
from flowerdiff.losses import euclidean_distance_loss
from flowerdiff.models.vgg import VGGFeatures, load_vgg_params


def _plain_ln(x32, weight, bias, eps=1e-5):
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * weight + bias


class TestResidentLN:
    def _data(self, seed=0, shape=(4, 8, 8, 6)):
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        x = jax.random.normal(k1, shape, jnp.float32) * 3.0 + 0.7
        w = jax.random.normal(k2, (shape[-1],), jnp.float32) * 0.5 + 1.0
        b = jax.random.normal(k3, (shape[-1],), jnp.float32) * 0.2
        return x, w, b

    def test_forward_matches_f32_formula(self):
        x, w, b = self._data()
        y_ref = _plain_ln(x, w, b)
        y = _ln2d_resident(x.astype(jnp.bfloat16), w, b, 1e-5)
        assert y.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(y_ref),
                                   rtol=0, atol=0.05)

    def test_backward_formula_exact_in_f32(self):
        # the hand-derived vjp must equal autodiff of the plain formula when
        # no low-precision rounding is involved (f32 input keeps the
        # resident path's "residual dtype" = f32)
        x, w, b = self._data(seed=1)

        def loss_ref(x, w, b):
            return jnp.sum(jnp.sin(_plain_ln(x, w, b)))

        def loss_res(x, w, b):
            return jnp.sum(jnp.sin(_ln2d_resident(x, w, b, 1e-5)))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        g_res = jax.grad(loss_res, argnums=(0, 1, 2))(x, w, b)
        for a, r in zip(g_res, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)

    def test_grads_close_to_f32_reference(self):
        # end-to-end sanity vs the pure-f32 formula (bf16 forward rounding
        # feeds the nonlinearity, so tolerances are loose by construction)
        x, w, b = self._data(seed=4)

        def loss_ref(x, w, b):
            return jnp.mean(_plain_ln(x, w, b) ** 2)

        def loss_res(x, w, b):
            y = _ln2d_resident(x.astype(jnp.bfloat16), w, b, 1e-5)
            return jnp.mean(y.astype(jnp.float32) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        g_res = jax.grad(loss_res, argnums=(0, 1, 2))(x, w, b)
        for a, r in zip(g_res, g_ref):
            r = np.asarray(r, np.float32)
            scale = max(1.0, float(np.abs(r).max()))
            np.testing.assert_allclose(np.asarray(a, np.float32), r,
                                       rtol=0, atol=0.05 * scale)

    def test_module_routes_bf16_through_resident(self):
        x, _, _ = self._data(seed=2, shape=(2, 4, 4, 3))
        ln = LayerNorm2d(3, dtype=jnp.bfloat16)
        params = ln.init(jax.random.key(0), x)
        y = ln.apply(params, x)
        assert y.dtype == jnp.bfloat16
        y_ref = _plain_ln(x, params["params"]["weight"], params["params"]["bias"])
        np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(y_ref),
                                   rtol=0, atol=0.05)

    def test_f32_module_path_unchanged(self):
        x, _, _ = self._data(seed=3, shape=(2, 4, 4, 3))
        ln = LayerNorm2d(3)
        params = ln.init(jax.random.key(0), x)
        y = ln.apply(params, x)
        assert y.dtype == jnp.float32
        y_ref = _plain_ln(x, params["params"]["weight"], params["params"]["bias"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6)


class TestBF16VGG:
    def test_features_close_to_f32(self):
        params, _ = load_vgg_params()  # asset or seeded random fallback
        x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3), jnp.float32)
        f32 = VGGFeatures().apply(params, x)
        f16 = VGGFeatures(dtype=jnp.bfloat16).apply(params, x)
        assert f16.dtype == jnp.bfloat16
        denom = np.maximum(np.abs(np.asarray(f32)), 1.0)
        rel = np.abs(np.asarray(f16, np.float32) - np.asarray(f32)) / denom
        assert float(rel.mean()) < 0.02, float(rel.mean())

    def test_distance_accumulates_f32(self):
        x = jnp.full((1, 4096), 1.0, jnp.bfloat16)
        y = jnp.zeros((1, 4096), jnp.bfloat16)
        d = euclidean_distance_loss(x, y)
        # bf16 accumulation would collapse the 4096-term sum; f32 gives 64
        assert d.dtype == jnp.float32
        np.testing.assert_allclose(float(d), 64.0, rtol=1e-3)


class TestBF16TrainStep:
    def test_tiny_bf16_step_runs_and_learns(self):
        from flowerdiff.train.vae_gan import (
            VAEGANConfig, create_vae_gan_state, gates_array, make_vae_gan_step)
        from flowerdiff.train.schedules import vae_gan_loss_gates

        cfg = VAEGANConfig(
            latent_dim=16, channels=(4, 8, 12, 16), head_width=16,
            use_perceptual=True, compute_dtype="bfloat16", total_steps=10)
        state, vae, disc = create_vae_gan_state(jax.random.key(0), cfg)
        from flowerdiff.models.vgg import VGGPerceptual
        vgg = VGGPerceptual()
        step = make_vae_gan_step(vae, disc, cfg, vgg)
        images = jax.random.uniform(jax.random.key(1), (4, 64, 64, 3))
        labels = jnp.array([0, 1, 2, 3], jnp.int32)
        gates = gates_array(vae_gan_loss_gates(200, 1200))
        # the jitted step donates the input state — snapshot before calling
        before = np.asarray(jax.tree.leaves(state.gen.params)[0])
        new_state, metrics = step(state, images, labels, gates,
                                  jax.random.key(2), vgg.params)
        assert np.isfinite(float(metrics["total"]))
        assert np.isfinite(float(metrics["perceptual"]))
        after = np.asarray(jax.tree.leaves(new_state.gen.params)[0])
        assert not np.allclose(before, after)


class TestBF16Decode:
    def test_bf16_decode_matches_f32_within_quantization(self):
        """The serving/bench decode lane runs the decoder convs in bf16
        (params stay f32). Images live in [0,1] and are consumed as uint8
        (serving quantizes on device), so the pin is sub-quantization
        agreement with the f32 decode: mean abs error well under 1/255.
        (Round-5 motivation: f32 decode measured 20.4% MFU vs the sampler
        kernel's ~83% — bench.py pallas_fused_bf16dec lane.)"""
        from flowerdiff.models.vae import FlowerVAE

        vae32 = FlowerVAE(latent_dim=32, channels=(8, 12, 16, 24), head_width=32)
        vae16 = FlowerVAE(latent_dim=32, channels=(8, 12, 16, 24), head_width=32,
                          dtype=jnp.bfloat16)
        rng = jax.random.key(0)
        vp = vae32.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                        method=FlowerVAE.init_all)
        z = jax.random.normal(jax.random.key(1), (8, 32), jnp.float32) * 2.0
        img32 = np.asarray(vae32.apply(vp, z, method=FlowerVAE.decode))
        img16 = np.asarray(
            vae16.apply(vp, z, method=FlowerVAE.decode), np.float32)
        assert img32.shape == img16.shape == (8, 64, 64, 3)
        mae = float(np.mean(np.abs(img32 - img16)))
        mx = float(np.max(np.abs(img32 - img16)))
        assert mae < 1.0 / 255.0, mae
        assert mx < 16.0 / 255.0, mx
