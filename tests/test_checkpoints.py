"""Checkpoint tests: atomic step-directory manager semantics and the
full-state exact-resume guarantee (train K steps, checkpoint, restore into a
FRESH process-equivalent trainer, train 1 step == train K+1 uninterrupted,
bitwise). Reference parity: the torch.save bundles at v1:1179-1191 and the
filename-epoch resume at v1:1352-1363 — but the reference never saves
optimizer state, so its resume resets Adam moments; ours must not."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flowerdiff.train.checkpoints import (
    CheckpointManager,
    parse_epoch_from_filename,
    state_to_tree,
    tree_into_state,
    tree_into_vae_gan_state,
    vae_gan_state_to_tree,
)
from flowerdiff.train.latent_ddpm import (
    LatentDiffusionConfig,
    create_latent_diffusion_state,
    make_latent_diffusion_step,
)
from flowerdiff.train.schedules import vae_gan_loss_gates
from flowerdiff.train.vae_gan import (
    VAEGANConfig,
    create_vae_gan_state,
    gates_array,
    make_vae_gan_step,
)
from flowerdiff.models.vae import FlowerVAE
from flowerdiff.models.discriminator import Discriminator64

TINY = dict(channels=(8, 16, 24, 32), head_width=32)


def _tiny_vae_setup(rng):
    cfg = VAEGANConfig(num_classes=5, latent_dim=8, total_steps=16,
                       use_perceptual=False)
    vae = FlowerVAE(latent_dim=8, num_classes=5, **TINY)
    state, vae, disc = create_vae_gan_state(rng, cfg, vae=vae,
                                            disc=Discriminator64())
    step = make_vae_gan_step(vae, disc, cfg, vgg=None)
    return cfg, state, step


# --------------------------------------------------------------------- #
# Manager semantics
# --------------------------------------------------------------------- #

def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    tree = {"a": jnp.arange(5, dtype=jnp.float32), "b": {"c": jnp.float32(3.5)}}
    mgr.save(3, tree)
    assert mgr.exists() and mgr.latest_step() == 3
    out = mgr.restore(like=tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5, dtype=np.float32))
    assert float(out["b"]["c"]) == 3.5


def test_overwrite_same_step_keeps_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    tree = {"x": jnp.zeros(3)}
    mgr.save(1, tree)
    mgr.save(1, {"x": jnp.ones(3)})
    out = mgr.restore(1, like=tree)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.ones(3))
    # No stale .new/.old staging dirs left behind.
    leftovers = [n for n in os.listdir(mgr.directory) if not n.startswith("step_")]
    assert leftovers == []


def test_prune_keeps_newest(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=3)
    tree = {"x": jnp.zeros(2)}
    for s in range(6):
        mgr.save(s, tree)
    assert mgr.all_steps() == [3, 4, 5]


def test_crash_recovery_sweep(tmp_path):
    """Simulated crash states: a `.old` orphan (crash between the promote
    renames) is restored; stale `.new`/`.old` staging is swept."""
    mgr = CheckpointManager(str(tmp_path / "ck"))
    tree = {"x": jnp.arange(3, dtype=jnp.float32)}
    mgr.save(2, tree)
    # Crash between renames: step_2 moved aside, new never promoted.
    os.rename(mgr._step_dir(2), mgr._step_dir(2) + ".old")
    os.makedirs(mgr._step_dir(2) + ".new")
    mgr2 = CheckpointManager(str(tmp_path / "ck"))
    assert mgr2.all_steps() == [2]
    out = mgr2.restore(2, like=tree)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.arange(3, dtype=np.float32))
    leftovers = [n for n in os.listdir(mgr2.directory) if not n.startswith("step_")]
    assert leftovers == []


def test_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"))
    with pytest.raises(FileNotFoundError):
        mgr.restore()


def test_parse_epoch_from_filename():
    assert parse_epoch_from_filename("a/conditional_diffusion_epoch_450.pt") == 450
    assert parse_epoch_from_filename("vae_gan_final.pt") is None


# --------------------------------------------------------------------- #
# Exact resume: VAE-GAN (gen + disc TrainStates + centers)
# --------------------------------------------------------------------- #

def test_vae_gan_exact_resume(tmp_path):
    rng = jax.random.key(7)
    data_rng = jax.random.key(8)
    images = jax.random.uniform(data_rng, (4, 64, 64, 3))
    labels = jnp.array([0, 1, 2, 3], jnp.int32)
    gates = gates_array(vae_gan_loss_gates(200, 300))

    cfg, state, step = _tiny_vae_setup(rng)
    K = 3
    for i in range(K):
        state, _ = step(state, images, labels, gates, jax.random.key(100 + i), None)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(K, jax.tree.map(jnp.copy, vae_gan_state_to_tree(state)))
    # Continue the uninterrupted run one more step.
    state, _ = step(state, images, labels, gates, jax.random.key(100 + K), None)

    # "Fresh process": new state from the same init key, full restore.
    _, state2, step2 = _tiny_vae_setup(rng)
    restored = mgr.restore(like=vae_gan_state_to_tree(state2))
    state2 = tree_into_vae_gan_state(state2, restored)
    assert int(state2.gen.step) == K  # schedule position restored
    state2, _ = step2(state2, images, labels, gates, jax.random.key(100 + K), None)

    for name, a, b in (
        ("gen", state.gen.params, state2.gen.params),
        ("disc", state.disc.params, state2.disc.params),
        ("gen_opt", state.gen.opt_state, state2.gen.opt_state),
    ):
        leaves_a = jax.tree.leaves(a)
        leaves_b = jax.tree.leaves(b)
        assert len(leaves_a) == len(leaves_b)
        for la, lb in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(
                np.asarray(la), np.asarray(lb), err_msg=f"mismatch in {name}"
            )
    np.testing.assert_array_equal(np.asarray(state.centers), np.asarray(state2.centers))


# --------------------------------------------------------------------- #
# Exact resume: latent diffusion TrainState
# --------------------------------------------------------------------- #

def test_latent_diffusion_exact_resume(tmp_path):
    cfg = LatentDiffusionConfig(
        latent_dim=8, hidden_dims=(16, 32, 16), time_emb_dim=8,
        num_classes=5, n_steps=20, steps_per_epoch=2,
    )
    rng = jax.random.key(3)
    vae = FlowerVAE(latent_dim=8, num_classes=5, **TINY)
    vae_params = vae.init(
        {"params": jax.random.key(4)}, jnp.zeros((1, 64, 64, 3)),
        jax.random.key(5), method=FlowerVAE.init_all,
    )["params"]
    images = jax.random.uniform(jax.random.key(6), (4, 64, 64, 3))
    labels = jnp.array([0, 1, 2, 3], jnp.int32)

    def fresh():
        state, model, sched = create_latent_diffusion_state(rng, cfg)
        step = make_latent_diffusion_step(model, vae, sched, cfg)
        return state, sched, step

    state, sched, step = fresh()
    K = 3
    for i in range(K):
        state, _ = step(state, vae_params, sched, images, labels, None,
                        jax.random.key(50 + i))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(K, jax.tree.map(jnp.copy, state_to_tree(state)))
    state, _ = step(state, vae_params, sched, images, labels, None,
                    jax.random.key(50 + K))

    state2, sched2, step2 = fresh()
    state2 = tree_into_state(state2, mgr.restore(like=state_to_tree(state2)))
    assert int(state2.step) == K
    state2, _ = step2(state2, vae_params, sched2, images, labels, None,
                      jax.random.key(50 + K))

    for la, lb in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(jax.tree.leaves(state.opt_state),
                      jax.tree.leaves(state2.opt_state)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
