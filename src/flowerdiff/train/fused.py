"""Fused multi-step / multi-epoch training dispatches.

The reference's training loop pays a host round-trip per batch (tqdm loop,
v1/model_train_test.py:1060; plus per-batch `.to(device)` and seven `.item()`
syncs). Round-1 flowerdiff already fused each STEP into one XLA program;
these factories fuse WHOLE EPOCHS (or several) into ONE dispatch:

    lax.scan over (T, B) index rows:
        gather batch from the device-resident dataset
        -> augment (flip / rotate / color-jitter, same stack as
           data/pipeline.py make_augment_fn)
        -> train step body (train/vae_gan.py, latent_ddpm.py, pixel_ddpm.py)

Host work per dispatch: ONE permutation-index upload of T*B int32 (a few KB)
and one fetch of the per-step loss vector. On the tunneled-chip deployment,
per-dispatch latency dominated the small latent step (BASELINE.md round-2:
2.85 ms/step of which most is dispatch); scanning an epoch amortizes it to
one dispatch per epoch-chunk, the same trick kernels/full_sampler.py plays
for the 1000-step sampler.

Semantics are identical to the per-step loop: the scan body IS the same
step body (make_*_step_body), the gather+augment IS the same augment stack,
and the RNG scheme is made explicit via the `offsets` row vector — row r
uses fold_in(rng, offsets[r]) for the step and fold_in(data_key, offsets[r])
for the augmentation, so the host chooses per-epoch restarting offsets to
mirror the loop path exactly (tests/test_fused.py asserts equivalence).

Epoch-varying hyperparameters (the VAE-GAN's staged loss gates,
train/schedules.py) arrive as a (T, 5) array — one gate row per step — so
multi-epoch dispatches cross gate-stage boundaries (epochs 40/80/160)
INSIDE the scan without recompiling. LR schedules are step-indexed off
state.step and advance correctly across dispatch boundaries.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowerdiff.data.pipeline import make_augment_fn
from flowerdiff.models.discriminator import Discriminator64
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser
from flowerdiff.models.pixel_unet import PixelUNet
from flowerdiff.models.vae import FlowerVAE
from flowerdiff.models.vgg import VGGPerceptual
from flowerdiff.train.latent_ddpm import (
    LatentDiffusionConfig,
    make_latent_diffusion_step_body,
)
from flowerdiff.train.pixel_ddpm import PixelDiffusionConfig, make_pixel_diffusion_step_body
from flowerdiff.train.vae_gan import VAEGANConfig, make_vae_gan_step_body


def _make_gather(augment: bool, max_rotation_deg: float, jitter: float,
                 mesh: Optional[Mesh]):
    """(images_u8, idx_row, data_key, offset) -> float batch in [0,1].

    Same gather + augment program as DeviceDataset._assemble, inlined into
    the scan body so batch assembly fuses with the step.
    """
    augment_fn = make_augment_fn(max_rotation_deg, jitter) if augment else None

    def gather(images_u8, idx_row, data_key, offset):
        imgs = jnp.take(images_u8, idx_row, axis=0).astype(jnp.float32) / 255.0
        if augment_fn is not None:
            imgs = augment_fn(imgs, jax.random.fold_in(data_key, offset))
        if mesh is not None:
            imgs = jax.lax.with_sharding_constraint(
                imgs, NamedSharding(mesh, P("data", None, None, None))
            )
        return imgs

    return gather


def _take_sharded(arr, idx_row, mesh: Optional[Mesh]):
    out = jnp.take(arr, idx_row, axis=0)
    if mesh is not None:
        out = jax.lax.with_sharding_constraint(out, NamedSharding(mesh, P("data")))
    return out


def make_fused_vae_gan_epochs(
    vae: FlowerVAE,
    disc: Discriminator64,
    cfg: VAEGANConfig,
    vgg: Optional[VGGPerceptual] = None,
    augment: bool = True,
    max_rotation_deg: float = 10.0,
    jitter: float = 0.2,
    mesh: Optional[Mesh] = None,
):
    """fn(state, images_u8, labels_all, idx, offsets, gates, rng, data_key,
    vgg_params) -> (state, metrics with (T,) leaves).

      idx:     (T, B) int32 — T batches of dataset row indices
      offsets: (T,)   int32 — per-row RNG offsets (step index within epoch
               to mirror the loop path's fold_in(rng_epoch, i))
      gates:   (T, 5) float32 — per-STEP loss gates (rows repeat within an
               epoch, change at epoch boundaries)
    """
    step_body = make_vae_gan_step_body(vae, disc, cfg, vgg)
    gather = _make_gather(augment, max_rotation_deg, jitter, mesh)

    def epochs_fn(state, images_u8, labels_all, idx, offsets, gates, rng,
                  data_key, vgg_params):
        def body(carry, xs):
            st = carry
            idx_row, offset, gates_row = xs
            imgs = gather(images_u8, idx_row, data_key, offset)
            labs = _take_sharded(labels_all, idx_row, mesh)
            st, metrics = step_body(
                st, imgs, labs, gates_row, jax.random.fold_in(rng, offset),
                vgg_params,
            )
            return st, metrics

        return jax.lax.scan(body, state, (idx, offsets, gates))

    return jax.jit(epochs_fn, donate_argnums=(0,))


def make_fused_latent_epochs(
    model: ConditionalLatentDenoiser,
    vae: FlowerVAE,
    sched,
    cfg: LatentDiffusionConfig,
    has_colors: bool = False,
    augment: bool = True,
    max_rotation_deg: float = 10.0,
    jitter: float = 0.2,
    mesh: Optional[Mesh] = None,
):
    """fn(state, vae_params, sched, images_u8, labels_all, colors_all, idx,
    offsets, rng, data_key, latent_stats) -> (state, losses (T,)).

    colors_all must be None iff has_colors is False (static arity)."""
    step_body = make_latent_diffusion_step_body(model, vae, sched, cfg)
    gather = _make_gather(augment, max_rotation_deg, jitter, mesh)

    def epochs_fn(state, vae_params, sched_arg, images_u8, labels_all,
                  colors_all, idx, offsets, rng, data_key, latent_stats):
        def body(carry, xs):
            st = carry
            idx_row, offset = xs
            imgs = gather(images_u8, idx_row, data_key, offset)
            labs = _take_sharded(labels_all, idx_row, mesh)
            cols = _take_sharded(colors_all, idx_row, mesh) if has_colors else None
            st, loss = step_body(
                st, vae_params, sched_arg, imgs, labs, cols,
                jax.random.fold_in(rng, offset), latent_stats,
            )
            return st, loss

        return jax.lax.scan(body, state, (idx, offsets))

    return jax.jit(epochs_fn, donate_argnums=(0,))


def make_fused_pixel_epochs(
    model: PixelUNet,
    cfg: PixelDiffusionConfig,
    augment: bool = True,
    max_rotation_deg: float = 10.0,
    jitter: float = 0.2,
    mesh: Optional[Mesh] = None,
):
    """fn(state, sched, images_u8, idx, offsets, rng, data_key)
    -> (state, losses (T,))."""
    step_body = make_pixel_diffusion_step_body(model, None)
    gather = _make_gather(augment, max_rotation_deg, jitter, mesh)

    def epochs_fn(state, sched_arg, images_u8, idx, offsets, rng, data_key):
        def body(carry, xs):
            st = carry
            idx_row, offset = xs
            imgs = gather(images_u8, idx_row, data_key, offset)
            st, loss = step_body(
                st, sched_arg, imgs, jax.random.fold_in(rng, offset)
            )
            return st, loss

        return jax.lax.scan(body, state, (idx, offsets))

    return jax.jit(epochs_fn, donate_argnums=(0,))


def epoch_rows(
    rng, n: int, batch_size: int, epochs: int, shuffle: bool = True,
    drop_remainder: bool = True,
):
    """Host-side index plan: (T, B) dataset rows + (T,) per-epoch-restarting
    offsets for `epochs` epochs over an n-item dataset (one permutation per
    epoch, same policy as DeviceDataset.batches)."""
    import numpy as np

    if isinstance(rng, (int, np.integer)):
        rng = np.random.default_rng(int(rng))
    steps = n // batch_size if drop_remainder else -(-n // batch_size)
    if steps == 0:
        steps = 1
        batch_size = n
    idx = np.empty((epochs * steps, batch_size), np.int32)
    offsets = np.empty((epochs * steps,), np.int32)
    for e in range(epochs):
        order = rng.permutation(n) if shuffle else np.arange(n)
        for s in range(steps):
            row = order[s * batch_size:(s + 1) * batch_size]
            if len(row) < batch_size:  # wrap the tail (only if not dropping)
                row = np.concatenate([row, order[:batch_size - len(row)]])
            idx[e * steps + s] = row
            offsets[e * steps + s] = s
    return jnp.asarray(idx), jnp.asarray(offsets), steps
