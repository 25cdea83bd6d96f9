"""Fused multi-epoch dispatch (train/fused.py) == per-step loop.

The fused path must be SEMANTICALLY IDENTICAL to the loop path: same step
body, same gather+augment program, same RNG scheme (row r uses
fold_in(rng, offsets[r]) / fold_in(data_key, offsets[r])). These tests run
both on the same index plan and assert loss-trajectory and parameter
equivalence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowerdiff.data.pipeline import DeviceDataset, make_augment_fn
from flowerdiff.train.fused import (
    epoch_rows,
    make_fused_latent_epochs,
    make_fused_pixel_epochs,
    make_fused_vae_gan_epochs,
)
from flowerdiff.train.latent_ddpm import (
    LatentDiffusionConfig,
    LatentDiffusionTrainer,
    create_latent_diffusion_state,
    make_latent_diffusion_step,
)
from flowerdiff.train.pixel_ddpm import (
    PixelDiffusionConfig,
    PixelDiffusionTrainer,
    create_pixel_diffusion_state,
    make_pixel_diffusion_step,
)
from flowerdiff.train.schedules import vae_gan_loss_gates
from flowerdiff.train.vae_gan import (
    VAEGANConfig,
    VAEGANTrainer,
    create_vae_gan_state,
    gates_array,
    make_vae_gan_step,
)

N, B, H = 12, 4, 64  # tiny dataset / batch; Discriminator64 needs 64x64


def _dataset(rng=0, colors=False):
    r = np.random.default_rng(rng)
    images = r.integers(0, 256, (N, H, H, 3), dtype=np.uint8)
    labels = r.integers(0, 5, (N,), dtype=np.int64)
    cols = r.integers(0, 3, (N,), dtype=np.int64) if colors else None
    return DeviceDataset(images, labels, colors=cols)


def _loop_gather(ds, idx_row, data_key, offset):
    aug = make_augment_fn(ds.max_rotation_deg, ds.jitter)
    imgs = jnp.take(ds.images, idx_row, axis=0).astype(jnp.float32) / 255.0
    return aug(imgs, jax.random.fold_in(data_key, offset))


def _tree_close(a, b, rtol=2e-4, atol=1e-5):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        )


def _params_close_to_update_scale(init, a, b, k=3.0):
    """Per-leaf |a-b| <= k * max|update| + eps.

    Adam is scale-invariant: a leaf whose TRUE gradient is ~0 still gets an
    lr-sized update whose direction is float-noise, and the fused scan and
    the per-step loop are different XLA compilations so that noise differs.
    Two paths can therefore disagree by O(update) on such leaves; a real
    wiring bug (wrong LR position, wrong gates, skipped step) shifts leaves
    by >> k updates relative to each other over meaningful leaves — and is
    caught far more sharply by the loss-trajectory assertions anyway."""
    for x0, xa, xb in zip(
        jax.tree.leaves(init), jax.tree.leaves(a), jax.tree.leaves(b)
    ):
        x0, xa, xb = (np.asarray(v, np.float64) for v in (x0, xa, xb))
        upd = max(np.max(np.abs(xa - x0)), np.max(np.abs(xb - x0)))
        assert np.max(np.abs(xa - xb)) <= k * upd + 1e-12


def test_fused_latent_epochs_match_loop():
    ds = _dataset()
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50,
    )
    rng = jax.random.key(0)
    state, model, sched = create_latent_diffusion_state(rng, cfg)
    state_l = jax.tree.map(jnp.copy, state)

    # Tiny VAE to supply frozen encoder params.
    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    vae_params = vstate.gen.params

    idx, offsets, steps = epoch_rows(0, N, B, epochs=2)
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    fused = make_fused_latent_epochs(model, vae, sched, cfg)
    state_f, losses_f = fused(
        state, vae_params, sched, ds.images, ds.labels, None, idx, offsets,
        step_rng, data_key, None,
    )

    step = make_latent_diffusion_step(model, vae, sched, cfg)
    losses_l = []
    for r in range(idx.shape[0]):
        imgs = _loop_gather(ds, idx[r], data_key, offsets[r])
        labs = jnp.take(ds.labels, idx[r], axis=0)
        state_l, loss = step(
            state_l, vae_params, sched, imgs, labs, None,
            jax.random.fold_in(step_rng, offsets[r]), None,
        )
        losses_l.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(losses_f), np.asarray(losses_l), rtol=2e-5, atol=1e-6
    )
    assert int(state_f.step) == int(state_l.step) == idx.shape[0]
    _tree_close(state_f.params, state_l.params)


def test_fused_latent_epoch_encode_matches_loop():
    """epoch_encode=True batches the frozen-VAE encode once per epoch; the
    per-sample semantics (augment keys, reparameterization keys off
    state.step, denoiser math) are unchanged, so it must match the per-step
    loop to conv-batching tolerance. Exercises EMA + cond_dropout so the
    cfg_rng/drop_rng row-key plumbing is pinned too."""
    ds = _dataset()
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50, cond_dropout=0.2, ema_decay=0.99,
        epoch_encode=True,
    )
    rng = jax.random.key(0)
    state, model, sched = create_latent_diffusion_state(rng, cfg)
    state_l = jax.tree.map(jnp.copy, state)

    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    vae_params = vstate.gen.params

    steps = N // B
    idx, offsets, _ = epoch_rows(0, N, B, epochs=2)
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    fused = make_fused_latent_epochs(
        model, vae, sched, cfg, steps_per_epoch=steps, epoch_encode=True
    )
    state_f, losses_f = fused(
        state, vae_params, sched, ds.images, ds.labels, None, idx, offsets,
        step_rng, data_key, None,
    )

    step = make_latent_diffusion_step(model, vae, sched, cfg)
    losses_l = []
    for r in range(idx.shape[0]):
        imgs = _loop_gather(ds, idx[r], data_key, offsets[r])
        labs = jnp.take(ds.labels, idx[r], axis=0)
        state_l, loss = step(
            state_l, vae_params, sched, imgs, labs, None,
            jax.random.fold_in(step_rng, offsets[r]), None,
        )
        losses_l.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(losses_f), np.asarray(losses_l), rtol=1e-4, atol=1e-5
    )
    assert int(state_f.step) == int(state_l.step) == idx.shape[0]
    _tree_close(state_f.params, state_l.params)
    _tree_close(state_f.ema_params, state_l.ema_params)


def test_fused_latent_epoch_encode_train_kernel_matches_loop():
    """epoch_encode + the Pallas fwd+bwd train kernel (f32 matmuls,
    dropout 0 so the mask streams cannot differ) must match the per-step
    XLA loop: t/eps/CFG keys are derived identically by construction."""
    ds = _dataset()
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50, dropout_rate=0.0,
        cond_dropout=0.2, epoch_encode=True, train_kernel=True,
        train_kernel_dtype="float32",
    )
    rng = jax.random.key(0)
    state, model, sched = create_latent_diffusion_state(rng, cfg)
    state_l = jax.tree.map(jnp.copy, state)

    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    vae_params = vstate.gen.params

    steps = N // B
    idx, offsets, _ = epoch_rows(0, N, B, epochs=2)
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    fused = make_fused_latent_epochs(model, vae, sched, cfg,
                                     steps_per_epoch=steps)
    state_f, losses_f = fused(
        state, vae_params, sched, ds.images, ds.labels, None, idx, offsets,
        step_rng, data_key, None,
    )

    step = make_latent_diffusion_step(model, vae, sched, cfg)
    losses_l = []
    for r in range(idx.shape[0]):
        imgs = _loop_gather(ds, idx[r], data_key, offsets[r])
        labs = jnp.take(ds.labels, idx[r], axis=0)
        state_l, loss = step(
            state_l, vae_params, sched, imgs, labs, None,
            jax.random.fold_in(step_rng, offsets[r]), None,
        )
        losses_l.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(losses_f), np.asarray(losses_l), rtol=1e-4, atol=1e-5
    )
    _tree_close(state_f.params, state_l.params, rtol=2e-3, atol=2e-5)


def test_fused_latent_epoch_encode_bf16_tracks_f32():
    """encode_dtype='bfloat16' only relaxes the frozen encoder's conv
    precision: losses must track the f32 epoch-encode path loosely."""
    ds = _dataset()
    base = dict(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50, epoch_encode=True,
    )
    rng = jax.random.key(0)
    cfg32 = LatentDiffusionConfig(**base)
    cfg16 = LatentDiffusionConfig(**base, encode_dtype="bfloat16")
    state, model, sched = create_latent_diffusion_state(rng, cfg32)
    state16 = jax.tree.map(jnp.copy, state)

    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    vae_params = vstate.gen.params

    steps = N // B
    idx, offsets, _ = epoch_rows(0, N, B, epochs=2)
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    f32 = make_fused_latent_epochs(model, vae, sched, cfg32,
                                   steps_per_epoch=steps)
    _, losses32 = f32(state, vae_params, sched, ds.images, ds.labels, None,
                      idx, offsets, step_rng, data_key, None)
    f16 = make_fused_latent_epochs(model, vae, sched, cfg16,
                                   steps_per_epoch=steps)
    _, losses16 = f16(state16, vae_params, sched, ds.images, ds.labels, None,
                      idx, offsets, step_rng, data_key, None)
    np.testing.assert_allclose(
        np.asarray(losses32), np.asarray(losses16), rtol=0.05, atol=0.05
    )


def test_latent_cache_builder_and_cached_epochs():
    """Latent-cache path (cfg.latent_cache): builder emits a (K, N, L) pool
    of distinct posterior draws; cached training is deterministic in rng,
    decreases the loss, and advances step/EMA exactly like the loop."""
    from flowerdiff.train.fused import make_latent_cache_builder

    ds = _dataset()
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50, ema_decay=0.99,
        latent_cache=2, cache_refresh_epochs=3,
    )
    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    vae_params = vstate.gen.params

    builder = make_latent_cache_builder(vae, cfg, augment=True, chunk=5)
    pool = builder(vae_params, ds.images, jax.random.key(9), None)
    assert pool.shape == (2, N, 8)
    # distinct augment+reparam draws per slot
    assert not np.allclose(np.asarray(pool[0]), np.asarray(pool[1]))

    def run(seed):
        tr = LatentDiffusionTrainer(cfg, vae, jax.random.key(0))
        losses = tr.run_epochs_fused(ds, 7, vae_params, jax.random.key(seed),
                                     batch_size=B)
        return tr, losses

    tr1, losses1 = run(5)
    tr2, losses2 = run(5)
    np.testing.assert_allclose(losses1, losses2, rtol=1e-6)
    assert len(losses1) == 7
    assert int(tr1.state.step) == 7 * (N // B)
    assert tr1._pool_builds == 3  # epochs 0-2, 3-5, 6 (refresh_every=3)
    assert tr1.state.ema_params is not None
    # training moves the loss down on this fixed tiny problem
    tr3 = LatentDiffusionTrainer(cfg, vae, jax.random.key(0))
    more = tr3.run_epochs_fused(ds, 30, vae_params, jax.random.key(5),
                                batch_size=B)
    assert np.mean(more[-5:]) < np.mean(more[:5])


def test_latent_cache_with_train_kernel():
    """cached path + the Pallas train kernel (interpret mode on CPU)."""
    ds = _dataset()
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50,
        latent_cache=2, train_kernel=True, train_kernel_dtype="float32",
    )
    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    tr = LatentDiffusionTrainer(cfg, vae, jax.random.key(0))
    losses = tr.run_epochs_fused(ds, 4, vstate.gen.params, jax.random.key(5),
                                 batch_size=B)
    assert len(losses) == 4 and all(np.isfinite(losses))


def test_nested_scan_matches_flat_rows():
    """steps_per_epoch > 1 (the production nesting) visits the identical row
    sequence as the degenerate inner-length-1 nesting: same losses, same
    final params (pins _nested_scan's reshape/ordering)."""
    ds = _dataset()
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50,
    )
    rng = jax.random.key(0)
    state, model, sched = create_latent_diffusion_state(rng, cfg)
    state_b = jax.tree.map(jnp.copy, state)

    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    vae_params = vstate.gen.params

    idx, offsets, steps = epoch_rows(0, N, B, epochs=3)
    assert steps > 1  # the nesting must be non-trivial for this test
    step_rng, data_key = jax.random.key(2), jax.random.key(3)
    args = (vae_params, sched, ds.images, ds.labels, None, idx, offsets,
            step_rng, data_key, None)

    nested = make_fused_latent_epochs(model, vae, sched, cfg,
                                      steps_per_epoch=steps)
    state_n, losses_n = nested(state, *args)
    flat = make_fused_latent_epochs(model, vae, sched, cfg)  # inner length 1
    state_f, losses_f = flat(state_b, *args)

    np.testing.assert_allclose(np.asarray(losses_n), np.asarray(losses_f),
                               rtol=2e-5, atol=1e-6)
    _tree_close(state_n.params, state_f.params)


def test_fused_vae_gan_epochs_match_loop_across_gate_boundary():
    ds = _dataset()
    cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=12,
    )
    rng = jax.random.key(0)
    state, vae, disc = create_vae_gan_state(rng, cfg, img_size=H)
    state_l = jax.tree.map(jnp.copy, state)
    init_gen = jax.tree.map(np.asarray, state.gen.params)
    init_disc = jax.tree.map(np.asarray, state.disc.params)

    epochs, steps = 2, N // B
    idx, offsets, _ = epoch_rows(0, N, B, epochs=epochs)
    # Absolute epochs 59 and 60 cross the KL/center gate stage boundary
    # (train/schedules.py): per-row gates must switch mid-dispatch.
    gate_rows = [
        gates_array(vae_gan_loss_gates(59 + e, 300)) for e in range(epochs)
    ]
    gates = jnp.asarray(np.repeat(np.stack(gate_rows), steps, axis=0))
    assert not np.allclose(gate_rows[0], gate_rows[1])
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    fused = make_fused_vae_gan_epochs(vae, disc, cfg)
    state_f, metrics_f = fused(
        state, ds.images, ds.labels, idx, offsets, gates, step_rng, data_key,
        None,
    )

    step = make_vae_gan_step(vae, disc, cfg)
    totals_l = []
    for r in range(idx.shape[0]):
        imgs = _loop_gather(ds, idx[r], data_key, offsets[r])
        labs = jnp.take(ds.labels, idx[r], axis=0)
        state_l, m = step(
            state_l, imgs, labs, gates[r],
            jax.random.fold_in(step_rng, offsets[r]), None,
        )
        totals_l.append(float(m["total"]))

    # rtol 5e-5: fused scan and per-step loop are different XLA programs, so
    # the rotation-einsum augment path accumulates O(1e-5) relative float
    # noise between them; a wiring bug shifts totals by orders more.
    np.testing.assert_allclose(
        np.asarray(metrics_f["total"]), np.asarray(totals_l),
        rtol=5e-5, atol=1e-6,
    )
    assert int(state_f.step) == int(state_l.step) == idx.shape[0]
    _params_close_to_update_scale(init_gen, state_f.gen.params, state_l.gen.params)
    _params_close_to_update_scale(init_disc, state_f.disc.params, state_l.disc.params)
    _tree_close(state_f.centers, state_l.centers)


def test_fused_pixel_epochs_match_loop():
    ds = _dataset()
    cfg = PixelDiffusionConfig(img_size=H, base_channels=8, time_emb_dim=8,
                               n_steps=50)
    state, model, sched = create_pixel_diffusion_state(jax.random.key(0), cfg)
    state_l = jax.tree.map(jnp.copy, state)

    idx, offsets, _ = epoch_rows(0, N, B, epochs=2)
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    fused = make_fused_pixel_epochs(model, cfg)
    state_f, losses_f = fused(
        state, sched, ds.images, idx, offsets, step_rng, data_key
    )

    step = make_pixel_diffusion_step(model, sched)
    losses_l = []
    for r in range(idx.shape[0]):
        imgs = _loop_gather(ds, idx[r], data_key, offsets[r])
        state_l, loss = step(
            state_l, sched, imgs, jax.random.fold_in(step_rng, offsets[r])
        )
        losses_l.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(losses_f), np.asarray(losses_l), rtol=2e-5, atol=1e-6
    )
    _tree_close(state_f.params, state_l.params)


def test_trainer_fused_methods_smoke():
    ds = _dataset(colors=False)
    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=12,
    )
    trainer = VAEGANTrainer(vae_cfg, jax.random.key(0), img_size=H)
    hist = trainer.run_epochs_fused(
        ds, start_epoch=0, num_epochs_total=4, epochs=2,
        rng=jax.random.key(1), batch_size=B,
    )
    assert len(hist) == 2 and all(np.isfinite(h["total"]) for h in hist)
    assert int(trainer.state.step) == 2 * (N // B)

    lat_cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=N // B, n_steps=50,
    )
    lt = LatentDiffusionTrainer(lat_cfg, trainer.vae, jax.random.key(2))
    losses = lt.run_epochs_fused(
        ds, epochs=3, vae_params=trainer.state.gen.params,
        rng=jax.random.key(3), batch_size=B,
    )
    assert len(losses) == 3 and all(np.isfinite(x) for x in losses)
    assert int(lt.state.step) == 3 * (N // B)

    px_cfg = PixelDiffusionConfig(img_size=H, base_channels=8, time_emb_dim=8,
                                  n_steps=50)
    pt = PixelDiffusionTrainer(px_cfg, jax.random.key(4))
    losses = pt.run_epochs_fused(ds, epochs=2, rng=jax.random.key(5),
                                 batch_size=B)
    assert len(losses) == 2 and all(np.isfinite(x) for x in losses)


def test_fused_latent_with_colors():
    ds = _dataset(colors=True)
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        num_colors=3, steps_per_epoch=N // B, n_steps=50,
    )
    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    lt = LatentDiffusionTrainer(cfg, vae, jax.random.key(2))
    losses = lt.run_epochs_fused(
        ds, epochs=2, vae_params=vstate.gen.params, rng=jax.random.key(3),
        batch_size=B,
    )
    assert len(losses) == 2 and all(np.isfinite(x) for x in losses)


def test_epoch_rows_plan():
    idx, offsets, steps = epoch_rows(0, 10, 3, epochs=2)
    assert steps == 3 and idx.shape == (6, 3) and offsets.shape == (6,)
    # offsets are globally unique across the chunk, so every batch of every
    # epoch gets a fresh fold_in(data_key, offset) augmentation draw
    assert list(np.asarray(offsets)) == [0, 1, 2, 3, 4, 5]
    # each epoch's rows are drawn without replacement from a permutation
    for e in range(2):
        flat = np.asarray(idx[e * steps:(e + 1) * steps]).ravel()
        assert len(set(flat.tolist())) == len(flat)


def test_augment_keys_fresh_across_epochs():
    """The same step position in two different epochs of one fused chunk must
    fold a DIFFERENT augment key (regression for the round-2 advisory: offsets
    restarted per epoch, replaying identical flip/rotation/jitter draws)."""
    _, offsets, steps = epoch_rows(0, 10, 3, epochs=4)
    data_key = jax.random.key(9)
    keys = [jax.random.key_data(jax.random.fold_in(data_key, int(o)))
            for o in np.asarray(offsets)]
    as_tuples = {tuple(np.asarray(k).tolist()) for k in keys}
    assert len(as_tuples) == len(keys)


def test_fused_vae_gan_best_tracking_matches_host_selection():
    """track_best picks the epoch-END state of the argmin mean-total epoch —
    identical to replaying the same rows epoch-by-epoch and selecting on the
    host (reference best-checkpoint policy v1:1177-1182)."""
    ds = _dataset()
    cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=12,
    )
    rng = jax.random.key(0)
    state, vae, disc = create_vae_gan_state(rng, cfg, img_size=H)
    state_b = jax.tree.map(jnp.copy, state)
    steps = N // B
    epochs = 3
    idx, offsets, _ = epoch_rows(7, N, B, epochs=epochs)
    gates = jnp.tile(gates_array(vae_gan_loss_gates(1, 10)), (idx.shape[0], 1))
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    tracked = make_fused_vae_gan_epochs(
        vae, disc, cfg, steps_per_epoch=steps, track_best=True,
    )
    best0 = jax.tree.map(jnp.copy, state)
    st_t, metrics_t, bl, bi, bstate = tracked(
        state, ds.images, ds.labels, idx, offsets, gates, step_rng, data_key,
        None, jnp.float32(jnp.inf), best0,
    )

    # Host-side replication: same rows, one epoch at a time.
    plain = make_fused_vae_gan_epochs(vae, disc, cfg, steps_per_epoch=steps)
    means, states = [], []
    st = state_b
    for e in range(epochs):
        sl = slice(e * steps, (e + 1) * steps)
        st, m = plain(st, ds.images, ds.labels, idx[sl], offsets[sl],
                      gates[sl], step_rng, data_key, None)
        means.append(float(jnp.mean(m["total"])))
        states.append(jax.tree.map(jnp.copy, st))
    want = int(np.argmin(means))

    assert int(bi) == want
    np.testing.assert_allclose(float(bl), means[want], rtol=2e-5)
    _tree_close(bstate.gen.params, states[want].gen.params)
    _tree_close(st_t.gen.params, st.gen.params)


def test_fused_vae_gan_chunk_matches_under_mesh():
    """`main.py --mesh_data N` executes run_epochs_fused(mesh=...) — the
    fused dispatch with DP sharding constraints (runner.py:203,
    train/fused.py _make_gather/_take_sharded). A DP(8) fused chunk must
    produce the same params and metrics as the single-placement fused chunk
    on the same index plan (VERDICT r2 item 2)."""
    from flowerdiff.parallel import create_mesh

    mesh = create_mesh(model=1)  # DP over the 8 virtual CPU devices
    NB = 16  # batch 8 shards over the data axis; 2 steps/epoch
    r = np.random.default_rng(5)
    images = r.integers(0, 256, (NB, H, H, 3), dtype=np.uint8)
    labels = r.integers(0, 5, (NB,), dtype=np.int64)
    ds = DeviceDataset(images, labels)
    ds_mesh = DeviceDataset(images, labels, mesh=mesh)

    cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=8,
    )
    rng = jax.random.key(0)
    state, vae, disc = create_vae_gan_state(rng, cfg, img_size=H)
    state_m = jax.tree.map(jnp.copy, state)
    init_gen = jax.tree.map(np.asarray, state.gen.params)

    epochs, bsz = 2, 8
    steps = NB // bsz
    idx, offsets, _ = epoch_rows(3, NB, bsz, epochs=epochs)
    gates = jnp.tile(gates_array(vae_gan_loss_gates(1, 10)), (idx.shape[0], 1))
    step_rng, data_key = jax.random.key(2), jax.random.key(3)
    args = (idx, offsets, gates, step_rng, data_key, None)

    plain = make_fused_vae_gan_epochs(vae, disc, cfg, steps_per_epoch=steps)
    state, metrics = plain(state, ds.images, ds.labels, *args)

    meshed = make_fused_vae_gan_epochs(vae, disc, cfg, mesh=mesh,
                                       steps_per_epoch=steps)
    state_m, metrics_m = meshed(state_m, ds_mesh.images, ds_mesh.labels, *args)

    np.testing.assert_allclose(
        np.asarray(metrics["total"]), np.asarray(metrics_m["total"]),
        rtol=5e-5, atol=1e-6,
    )
    _params_close_to_update_scale(init_gen, state.gen.params, state_m.gen.params)
    _tree_close(state.centers, state_m.centers, rtol=5e-4, atol=1e-5)


def test_fused_latent_chunk_matches_under_mesh():
    """Same check for the latent-diffusion fused chunk (the other code path
    `--mesh_data N` drives, runner.py:298)."""
    from flowerdiff.parallel import create_mesh

    mesh = create_mesh(model=1)
    NB = 16
    r = np.random.default_rng(6)
    images = r.integers(0, 256, (NB, H, H, 3), dtype=np.uint8)
    labels = r.integers(0, 5, (NB,), dtype=np.int64)
    ds = DeviceDataset(images, labels)
    ds_mesh = DeviceDataset(images, labels, mesh=mesh)

    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 16), time_emb_dim=8, num_classes=5,
        steps_per_epoch=2, n_steps=50,
    )
    rng = jax.random.key(0)
    state, model, sched = create_latent_diffusion_state(rng, cfg)
    state_m = jax.tree.map(jnp.copy, state)

    vae_cfg = VAEGANConfig(
        latent_dim=8, channels=(8, 16, 24, 32), head_width=32, num_classes=5,
        use_perceptual=False, total_steps=10,
    )
    vstate, vae, _ = create_vae_gan_state(jax.random.key(1), vae_cfg, img_size=H)
    vae_params = vstate.gen.params

    epochs, bsz = 2, 8
    steps = NB // bsz
    idx, offsets, _ = epoch_rows(4, NB, bsz, epochs=epochs)
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    plain = make_fused_latent_epochs(model, vae, sched, cfg,
                                     steps_per_epoch=steps)
    state, losses = plain(state, vae_params, sched, ds.images, ds.labels,
                          None, idx, offsets, step_rng, data_key, None)

    meshed = make_fused_latent_epochs(model, vae, sched, cfg, mesh=mesh,
                                      steps_per_epoch=steps)
    state_m, losses_m = meshed(state_m, vae_params, sched, ds_mesh.images,
                               ds_mesh.labels, None, idx, offsets, step_rng,
                               data_key, None)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_m),
                               rtol=5e-5, atol=1e-6)
    _tree_close(state.params, state_m.params, rtol=5e-4, atol=1e-5)


def test_fused_pixel_chunk_matches_under_mesh():
    """Same check for the PIXEL-family fused chunk — the third code path
    `--mesh_data N` drives (runner.py:386-389 wires mesh= into
    PixelDiffusionTrainer.run_epochs_fused). The only 2-D-conv trainer must
    also match single-placement under a DP mesh (VERDICT r3 item 4)."""
    from flowerdiff.parallel import create_mesh

    mesh = create_mesh(model=1)
    NB = 16
    r = np.random.default_rng(7)
    images = r.integers(0, 256, (NB, H, H, 3), dtype=np.uint8)
    labels = r.integers(0, 5, (NB,), dtype=np.int64)
    ds = DeviceDataset(images, labels)
    ds_mesh = DeviceDataset(images, labels, mesh=mesh)

    cfg = PixelDiffusionConfig(img_size=H, base_channels=8, time_emb_dim=8,
                               n_steps=50, learnable_residual=True)
    state, model, sched = create_pixel_diffusion_state(jax.random.key(0), cfg)
    state_m = jax.tree.map(jnp.copy, state)

    epochs, bsz = 2, 8
    steps = NB // bsz
    idx, offsets, _ = epoch_rows(8, NB, bsz, epochs=epochs)
    step_rng, data_key = jax.random.key(2), jax.random.key(3)

    plain = make_fused_pixel_epochs(model, cfg, steps_per_epoch=steps)
    state, losses = plain(state, sched, ds.images, idx, offsets, step_rng,
                          data_key)

    meshed = make_fused_pixel_epochs(model, cfg, mesh=mesh,
                                     steps_per_epoch=steps)
    state_m, losses_m = meshed(state_m, sched, ds_mesh.images, idx, offsets,
                               step_rng, data_key)

    np.testing.assert_allclose(np.asarray(losses), np.asarray(losses_m),
                               rtol=5e-5, atol=1e-6)
    _tree_close(state.params, state_m.params, rtol=5e-4, atol=1e-5)
