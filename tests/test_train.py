"""Training-step tests: the jitted VAE-GAN two-optimizer step, the latent and
pixel diffusion steps, LR schedules, and gate staging (SURVEY.md §7.3 items
1-2 are the risk areas these cover)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flowerdiff.models import ConditionalLatentDenoiser, Discriminator64
from flowerdiff.models.vae import FlowerVAE
from flowerdiff.train.latent_ddpm import (
    LatentDiffusionConfig,
    LatentDiffusionTrainer,
)
from flowerdiff.train.pixel_ddpm import PixelDiffusionConfig, PixelDiffusionTrainer
from flowerdiff.train.schedules import (
    cosine_warm_restarts_schedule,
    onecycle_schedule,
    vae_gan_loss_gates,
)
from flowerdiff.train.vae_gan import (
    VAEGANConfig,
    create_vae_gan_state,
    gates_array,
    make_vae_gan_step,
)

TINY_VAE = dict(channels=(8, 16, 24, 32), head_width=32)


def test_onecycle_shape():
    sched = onecycle_schedule(1e-3, 100)
    lrs = [float(sched(s)) for s in range(100)]
    assert lrs[0] == pytest.approx(1e-3 / 25, rel=1e-4)  # div_factor
    assert max(lrs) == pytest.approx(1e-3, rel=1e-2)  # peak at pct_start
    assert lrs[-1] < lrs[0]  # final_div_factor decay
    assert np.argmax(lrs) == pytest.approx(30, abs=2)  # pct_start=0.3


def test_cosine_warm_restarts_matches_torch():
    """Per-epoch SGDR with T_0=10, T_mult=2 (v1:1248) vs torch's scheduler."""
    import torch

    model = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    torch_sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=10, T_mult=2
    )
    torch_lrs = []
    for _ in range(70):
        torch_lrs.append(opt.param_groups[0]["lr"])
        torch_sched.step()

    ours = cosine_warm_restarts_schedule(1e-3, steps_per_epoch=1, t0=10, t_mult=2)
    our_lrs = [float(ours(e)) for e in range(70)]
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-4, atol=1e-9)


def test_loss_gates_staging():
    """v1:1072-1087 epoch staging."""
    g = vae_gan_loss_gates(0, 1200)
    assert (g.kl_factor, g.cls_factor, g.center_factor) == (0.0, 0.0, 0.0)
    g = vae_gan_loss_gates(60, 1200)
    assert g.kl_factor == 1.0 and g.cls_factor == 0.0
    g = vae_gan_loss_gates(100, 1200)
    assert g.kl_factor == 1.0 and g.cls_factor == 0.2 and g.center_factor == 0.0
    g = vae_gan_loss_gates(200, 1200)
    assert g.cls_factor == 1.0 and g.center_factor == 1.0 and g.update_centers == 1.0
    # KL weight ramp (v1:1055)
    assert vae_gan_loss_gates(0, 100).kl_weight == pytest.approx(0.001)
    assert vae_gan_loss_gates(60, 100).kl_weight == pytest.approx(0.05)


@pytest.fixture(scope="module")
def vae_gan_setup():
    cfg = VAEGANConfig(num_classes=7, latent_dim=16, total_steps=10,
                       use_perceptual=False)
    vae = FlowerVAE(latent_dim=16, num_classes=7, **TINY_VAE)
    disc = Discriminator64()
    state, vae, disc = create_vae_gan_state(
        jax.random.key(0), cfg, vae=vae, disc=disc
    )
    step = make_vae_gan_step(vae, disc, cfg, vgg=None)
    return cfg, state, step


def _fresh(state):
    # the train step donates its input state; tests sharing the fixture must
    # step on a copy
    return jax.tree.map(jnp.copy, state)


def test_vae_gan_step_runs_and_updates(vae_gan_setup):
    cfg, state, step = vae_gan_setup
    state = _fresh(state)
    images = jax.random.uniform(jax.random.key(1), (4, 64, 64, 3))
    labels = jnp.array([0, 1, 2, 3])
    gates = gates_array(vae_gan_loss_gates(200, 300))
    old_gen = jax.tree.leaves(state.gen.params)[0].copy()
    old_disc = jax.tree.leaves(state.disc.params)[0].copy()

    new_state, metrics = step(state, images, labels, gates, jax.random.key(2), None)
    for key in ("recon", "kl", "class", "center", "gan", "d_loss", "total"):
        assert np.isfinite(metrics[key]), key
    assert int(new_state.gen.step) == 1 and int(new_state.disc.step) == 1
    assert not np.allclose(np.asarray(jax.tree.leaves(new_state.gen.params)[0]),
                           np.asarray(old_gen))
    assert not np.allclose(np.asarray(jax.tree.leaves(new_state.disc.params)[0]),
                           np.asarray(old_disc))
    # center EMA active at epoch 200 gates: centers moved for present classes
    assert not np.allclose(np.asarray(new_state.centers[:4]), 0.0)
    # absent classes untouched
    np.testing.assert_array_equal(np.asarray(new_state.centers[5]), 0.0)


def test_vae_gan_centers_frozen_early(vae_gan_setup):
    cfg, state, step = vae_gan_setup
    state = _fresh(state)
    images = jax.random.uniform(jax.random.key(1), (4, 64, 64, 3))
    labels = jnp.array([0, 1, 2, 3])
    gates = gates_array(vae_gan_loss_gates(0, 300))  # recon-only stage
    new_state, metrics = step(state, images, labels, gates, jax.random.key(2), None)
    np.testing.assert_array_equal(np.asarray(new_state.centers), 0.0)


def test_latent_diffusion_step_decreases_over_steps():
    cfg = LatentDiffusionConfig(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16,
        num_classes=7, n_steps=50, steps_per_epoch=4,
    )
    vae = FlowerVAE(latent_dim=16, num_classes=7, **TINY_VAE)
    vae_params = vae.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 64, 64, 3)), jax.random.key(1),
        method=FlowerVAE.init_all,
    )["params"]
    trainer = LatentDiffusionTrainer(cfg, vae, jax.random.key(2))
    images = jax.random.uniform(jax.random.key(3), (8, 64, 64, 3))
    labels = jnp.arange(8) % 7
    losses = []
    for i in range(3):
        loss = trainer.run_epoch([(images, labels)], vae_params, jax.random.key(i))
        losses.append(loss)
    assert all(np.isfinite(l) for l in losses)
    assert int(trainer.state.step) == 3


def test_pixel_diffusion_trainer():
    cfg = PixelDiffusionConfig(base_channels=8, time_emb_dim=16, n_steps=50,
                               learnable_residual=True)
    trainer = PixelDiffusionTrainer(cfg, jax.random.key(0))
    images = jax.random.uniform(jax.random.key(1), (4, 64, 64, 3))
    loss = trainer.run_epoch([(images, None)], jax.random.key(2))
    assert np.isfinite(loss)
    assert int(trainer.state.step) == 1


def test_onecycle_matches_torch():
    """optax cosine_onecycle vs torch OneCycleLR(pct_start=.3, div=25,
    final_div=1000, cos anneal) — the reference's scheduler (v1:1031-1037)."""
    import torch

    model = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    torch_sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-4, total_steps=200, pct_start=0.3,
        div_factor=25, final_div_factor=1000,
    )
    torch_lrs = []
    for _ in range(200):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        torch_sched.step()

    ours = onecycle_schedule(1e-4, 200)
    our_lrs = [float(ours(s)) for s in range(200)]
    # optax's cosine-onecycle and torch's OneCycleLR agree on the cycle shape
    # (same peak, same phase split) but differ in interpolation details by up
    # to ~10% pointwise and in the terminal-value convention; assert the
    # shape-level agreement, peak position/magnitude, and tail decay.
    np.testing.assert_allclose(our_lrs[:190], torch_lrs[:190], rtol=0.12,
                               atol=2e-6)  # atol covers the tiny-lr tail
    assert abs(np.argmax(our_lrs) - np.argmax(torch_lrs)) <= 2
    np.testing.assert_allclose(max(our_lrs), max(torch_lrs), rtol=1e-3)
    assert our_lrs[-1] < 1e-6 and torch_lrs[-1] < 1e-6


def test_remat_vae_gan_step_matches_plain():
    """remat=True (HBM-traffic lever, models/vae.py) is a pure scheduling
    change: identical params at init, identical step metrics."""
    from flowerdiff.train.schedules import vae_gan_loss_gates
    from flowerdiff.train.vae_gan import (
        VAEGANConfig,
        create_vae_gan_state,
        gates_array,
        make_vae_gan_step,
    )

    imgs = jax.random.uniform(jax.random.key(1), (4, 64, 64, 3))
    labels = jnp.arange(4, dtype=jnp.int32) % 5
    gates = gates_array(vae_gan_loss_gates(200, 300))
    outs = {}
    for remat in (False, True):
        cfg = VAEGANConfig(latent_dim=8, channels=(8, 16, 24, 32),
                           head_width=32, num_classes=5, use_perceptual=False,
                           total_steps=4, remat=remat)
        state, vae, disc = create_vae_gan_state(jax.random.key(0), cfg)
        step = make_vae_gan_step(vae, disc, cfg)
        state, m = step(state, imgs, labels, gates, jax.random.key(2), None)
        outs[remat] = ({k: float(v) for k, v in m.items()}, state.gen.params)
    for k in outs[False][0]:
        np.testing.assert_allclose(outs[False][0][k], outs[True][0][k],
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
