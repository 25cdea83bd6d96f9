"""Denoiser weight-EMA tests (LatentDiffusionConfig.ema_decay).

The EMA advances inside `apply_gradients`, so the SAME mechanism covers the
per-batch loop and the fused whole-epoch dispatches (train/fused.py carries
the EMATrainState as a scan pytree). Lever provenance:
artifacts/cond_sweep_r3/STUDY.md (host-side snapshot EMA, now in-framework
per-step).
"""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.models.vae import FlowerVAE
from flowerdiff.train.checkpoints import state_to_tree, tree_into_state
from flowerdiff.train.latent_ddpm import (
    EMATrainState,
    LatentDiffusionConfig,
    LatentDiffusionTrainer,
)

TINY_VAE = dict(channels=(8, 16, 24, 32), head_width=32)


def _tiny_trainer(ema_decay):
    cfg = LatentDiffusionConfig(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16,
        num_classes=7, n_steps=50, steps_per_epoch=1, ema_decay=ema_decay,
    )
    vae = FlowerVAE(latent_dim=16, num_classes=7, **TINY_VAE)
    vae_params = vae.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 64, 64, 3)), jax.random.key(1),
        method=FlowerVAE.init_all,
    )["params"]
    return LatentDiffusionTrainer(cfg, vae, jax.random.key(2)), vae_params


def _leaves_close(a, b, **kw):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), **kw)


def test_ema_matches_manual_fold():
    """state.ema_params after k steps == the manual decay-fold over the
    post-step param trajectory (init at the initial params)."""
    d = 0.5
    trainer, vae_params = _tiny_trainer(d)
    assert isinstance(trainer.state, EMATrainState)
    manual = jax.tree.map(jnp.copy, trainer.state.params)
    images = jax.random.uniform(jax.random.key(3), (8, 64, 64, 3))
    labels = jnp.arange(8) % 7
    for i in range(3):
        trainer.run_epoch([(images, labels)], vae_params, jax.random.key(i))
        manual = jax.tree.map(
            lambda e, p: d * e + (1 - d) * p, manual, trainer.state.params
        )
    _leaves_close(trainer.state.ema_params, manual, rtol=1e-6, atol=1e-7)


def test_ema_off_keeps_plain_state_and_live_sampling_params():
    trainer, _ = _tiny_trainer(None)
    assert not isinstance(trainer.state, EMATrainState)
    assert trainer.sampling_params is trainer.state.params


def test_sampler_uses_ema_params():
    """With decay=1.0 the EMA stays frozen at init while the live params
    move — sampling must read the EMA copy."""
    trainer, vae_params = _tiny_trainer(1.0)
    init_params = jax.tree.map(jnp.copy, trainer.state.params)
    images = jax.random.uniform(jax.random.key(3), (8, 64, 64, 3))
    labels = jnp.arange(8) % 7
    trainer.run_epoch([(images, labels)], vae_params, jax.random.key(0))

    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(init_params),
                        jax.tree.leaves(trainer.state.params))
    )
    assert moved  # the live weights trained
    _leaves_close(trainer.sampling_params, init_params, rtol=0, atol=0)
    assert trainer.sampling_params is trainer.state.ema_params


def test_ema_fused_dispatch_matches_loop():
    """The fused whole-epoch dispatch advances the EMA identically to the
    per-batch loop (the state is a scan carry; no step-body changes)."""
    from flowerdiff.data.pipeline import DeviceDataset, make_augment_fn
    from flowerdiff.train.fused import epoch_rows, make_fused_latent_epochs
    from flowerdiff.train.latent_ddpm import (
        create_latent_diffusion_state,
        make_latent_diffusion_step,
    )
    from flowerdiff.train.vae_gan import VAEGANConfig, create_vae_gan_state

    N, B, H = 12, 4, 64
    r = np.random.default_rng(0)
    ds = DeviceDataset(
        r.integers(0, 256, (N, H, H, 3), dtype=np.uint8),
        r.integers(0, 5, (N,), dtype=np.int64),
    )

    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50, ema_decay=0.9,
    )
    state, model, sched = create_latent_diffusion_state(jax.random.key(0), cfg)
    state_l = jax.tree.map(jnp.copy, state)

    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    vae_params = vstate.gen.params

    idx, offsets, steps = epoch_rows(0, N, B, epochs=2)
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    fused = make_fused_latent_epochs(model, vae, sched, cfg)
    state_f, _ = fused(
        state, vae_params, sched, ds.images, ds.labels, None, idx, offsets,
        step_rng, data_key, None,
    )

    aug = make_augment_fn(ds.max_rotation_deg, ds.jitter)
    step = make_latent_diffusion_step(model, vae, sched, cfg)
    for row in range(idx.shape[0]):
        rows = jnp.asarray(idx[row])
        imgs = jnp.take(ds.images, rows, axis=0).astype(jnp.float32) / 255.0
        imgs = aug(imgs, jax.random.fold_in(data_key, int(offsets[row])))
        state_l, _ = step(
            state_l, vae_params, sched, imgs,
            jnp.take(ds.labels, rows, axis=0), None,
            jax.random.fold_in(step_rng, int(offsets[row])), None,
        )

    assert isinstance(state_f, EMATrainState)
    _leaves_close(state_f.ema_params, state_l.ema_params, rtol=2e-5, atol=1e-6)
    # and the EMA genuinely lags the live params
    diffs = [
        float(np.abs(np.asarray(e) - np.asarray(p)).max())
        for e, p in zip(jax.tree.leaves(state_f.ema_params),
                        jax.tree.leaves(state_f.params))
    ]
    assert max(diffs) > 0.0


def test_ema_checkpoint_roundtrip():
    trainer, vae_params = _tiny_trainer(0.9)
    images = jax.random.uniform(jax.random.key(3), (8, 64, 64, 3))
    labels = jnp.arange(8) % 7
    trainer.run_epoch([(images, labels)], vae_params, jax.random.key(0))

    tree = state_to_tree(trainer.state)
    assert "ema_params" in tree
    fresh, _ = _tiny_trainer(0.9)
    restored = tree_into_state(fresh.state, tree)
    _leaves_close(restored.ema_params, trainer.state.ema_params, rtol=0, atol=0)
    _leaves_close(restored.params, trainer.state.params, rtol=0, atol=0)
