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
for the augmentation. `epoch_rows` emits GLOBALLY unique offsets
(0..T-1 across the whole chunk, not restarting per epoch) so every batch in
a multi-epoch dispatch draws fresh augmentation parameters — matching the
loop path (DeviceDataset.batches draws a fresh key per epoch) and the
reference's fresh-per-batch augments. The step RNG is additionally
decorrelated by fold_in(rng, state.step) inside the step bodies.
tests/test_fused.py asserts fused==loop equivalence and that augment keys
differ across epochs within one chunk.

Epoch-varying hyperparameters (the VAE-GAN's staged loss gates,
train/schedules.py) arrive as a (T, 5) array — one gate row per step — so
multi-epoch dispatches cross gate-stage boundaries (epochs 40/80/160)
INSIDE the scan without recompiling. LR schedules are step-indexed off
state.step and advance correctly across dispatch boundaries.

The T rows are scanned as a NESTED scan — outer over epochs, inner over the
`steps_per_epoch` rows of one epoch — rather than one flat length-T scan.
Semantically identical (scan-of-scan over the reshaped rows visits the same
sequence), but XLA's compile time for a body containing the augmentation's
rotation einsums grows roughly LINEARLY with the visible scan length
(measured on v5e: flat T=160 VAE-GAN chunk 895 s cold, T=16 110 s, augment-
free T=160 104 s); nesting keeps the rotation-bearing scan at
steps-per-epoch length — 74 s cold for the same 10-epoch chunk, with
slightly better steady-state (425 vs 452 ms/epoch).
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


def _nested_scan(body, state, xs, steps_per_epoch: int):
    """scan-of-scan over the flat (T, ...) rows, reshaped to
    (T // steps_per_epoch, steps_per_epoch, ...). Visits the identical row
    sequence as a flat length-T scan; outputs are reshaped back to (T, ...)
    leaves. Keeps the inner (augment-bearing) scan short — see the module
    docstring for the measured compile-time cliff this avoids."""
    t = jax.tree.leaves(xs)[0].shape[0]
    if t % steps_per_epoch != 0:  # epoch_rows always emits whole epochs
        raise ValueError(f"T={t} not a multiple of steps={steps_per_epoch}")
    e = t // steps_per_epoch
    xs_n = jax.tree.map(
        lambda a: a.reshape((e, steps_per_epoch) + a.shape[1:]), xs
    )

    def outer(st, xs_e):
        return jax.lax.scan(body, st, xs_e)

    state, ys = jax.lax.scan(outer, state, xs_n)
    return state, jax.tree.map(lambda a: a.reshape((t,) + a.shape[2:]), ys)


def make_fused_vae_gan_epochs(
    vae: FlowerVAE,
    disc: Discriminator64,
    cfg: VAEGANConfig,
    vgg: Optional[VGGPerceptual] = None,
    augment: bool = True,
    max_rotation_deg: float = 10.0,
    jitter: float = 0.2,
    mesh: Optional[Mesh] = None,
    steps_per_epoch: int = 1,
    track_best: bool = False,
):
    """fn(state, images_u8, labels_all, idx, offsets, gates, rng, data_key,
    vgg_params) -> (state, metrics with (T,) leaves).

      idx:     (T, B) int32 — T batches of dataset row indices
      offsets: (T,)   int32 — per-row RNG offsets (step index within epoch
               to mirror the loop path's fold_in(rng_epoch, i))
      gates:   (T, 5) float32 — per-STEP loss gates (rows repeat within an
               epoch, change at epoch boundaries)
      T must equal (whole epochs) x steps_per_epoch.

    With track_best=True the fn takes two extra args (best_loss, best_state)
    and returns (state, metrics, best_loss, best_epoch_in_chunk, best_state):
    the outer (per-epoch) scan compares each epoch's MEAN total loss to the
    carried best and leaf-selects that epoch's END state — the reference's
    per-epoch best-checkpoint policy (v1:1177-1182) at epoch granularity
    INSIDE the single dispatch (a per-epoch host snapshot would re-serialize
    the chunk). best_epoch_in_chunk is -1 if no epoch beat best_loss.
    """
    step_body = make_vae_gan_step_body(vae, disc, cfg, vgg)
    gather = _make_gather(augment, max_rotation_deg, jitter, mesh)

    def body(st, xs, images_u8, labels_all, rng, data_key, vgg_params):
        idx_row, offset, gates_row = xs
        imgs = gather(images_u8, idx_row, data_key, offset)
        labs = _take_sharded(labels_all, idx_row, mesh)
        return step_body(
            st, imgs, labs, gates_row, jax.random.fold_in(rng, offset),
            vgg_params,
        )

    if not track_best:
        def epochs_fn(state, images_u8, labels_all, idx, offsets, gates, rng,
                      data_key, vgg_params):
            return _nested_scan(
                lambda st, xs: body(st, xs, images_u8, labels_all, rng,
                                    data_key, vgg_params),
                state, (idx, offsets, gates), steps_per_epoch,
            )

        return jax.jit(epochs_fn, donate_argnums=(0,))

    def epochs_fn_best(state, images_u8, labels_all, idx, offsets, gates,
                       rng, data_key, vgg_params, best_loss, best_state):
        t = idx.shape[0]
        e = t // steps_per_epoch
        xs = jax.tree.map(
            lambda a: a.reshape((e, steps_per_epoch) + a.shape[1:]),
            (idx, offsets, gates),
        )

        def outer(carry, xs_e):
            st, bl, bi, e_ix, bstate = carry
            st, ys = jax.lax.scan(
                lambda s, x: body(s, x, images_u8, labels_all, rng,
                                  data_key, vgg_params),
                st, xs_e,
            )
            epoch_mean = jnp.mean(ys["total"])
            better = epoch_mean < bl
            bl = jnp.where(better, epoch_mean, bl)
            bi = jnp.where(better, e_ix, bi)
            bstate = jax.tree.map(
                lambda b, n: jnp.where(better, n, b), bstate, st
            )
            return (st, bl, bi, e_ix + 1, bstate), ys

        carry0 = (state, best_loss, jnp.int32(-1), jnp.int32(0), best_state)
        (state, bl, bi, _, bstate), ys = jax.lax.scan(outer, carry0, xs)
        metrics = jax.tree.map(lambda a: a.reshape((t,) + a.shape[2:]), ys)
        return state, metrics, bl, bi, bstate

    return jax.jit(epochs_fn_best, donate_argnums=(0, 10))


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
    steps_per_epoch: int = 1,
    epoch_encode: Optional[bool] = None,
):
    """fn(state, vae_params, sched, images_u8, labels_all, colors_all, idx,
    offsets, rng, data_key, latent_stats) -> (state, losses (T,)).

    colors_all must be None iff has_colors is False (static arity).
    T must equal (whole epochs) x steps_per_epoch.

    epoch_encode=True (default from cfg.epoch_encode) restructures each epoch
    to encode the WHOLE epoch's augmented images through the frozen VAE in
    ONE batched call before scanning the denoiser steps — the decomposition
    (artifacts/decompose_latent_r4.json) shows the b64 per-step encode is 97%
    of the step FLOPs at only ~37% MFU while the same encode at epoch batch
    runs 45-65%. Semantics per sample are IDENTICAL (same augment keys, same
    per-row reparameterization keys keyed off state.step, same denoiser
    math); only the conv batching changes, so results match the loop path to
    conv-reduction tolerance. cfg.encode_dtype='bfloat16' additionally runs
    the frozen encoder's convs in bf16 (noise draw stays f32 — see
    make_latent_encode_fn); default None keeps the VAE's own dtype."""
    from flowerdiff.train.latent_ddpm import (
        make_latent_denoise_body,
        make_latent_encode_fn,
    )

    if epoch_encode is None:
        epoch_encode = getattr(cfg, "epoch_encode", False)
    if getattr(cfg, "train_kernel", False):
        if not epoch_encode:
            raise ValueError("cfg.train_kernel=True requires epoch_encode")
        if mesh is not None and mesh.devices.size > 1:
            raise ValueError(
                "cfg.train_kernel is the single-chip fast path; multi-chip "
                "training uses the XLA step body (pallas_call does not "
                "shard under a mesh without shard_map)"
            )
    step_body = make_latent_diffusion_step_body(model, vae, sched, cfg)
    gather = _make_gather(augment, max_rotation_deg, jitter, mesh)

    if not epoch_encode:
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

            return _nested_scan(body, state, (idx, offsets), steps_per_epoch)

        return jax.jit(epochs_fn, donate_argnums=(0,))

    enc_vae = vae
    enc_dtype = getattr(cfg, "encode_dtype", None)
    if enc_dtype is not None and enc_dtype != "float32":
        enc_vae = vae.clone(dtype=getattr(jnp, enc_dtype))
    encode = make_latent_encode_fn(enc_vae)
    if getattr(cfg, "train_kernel", False):
        from flowerdiff.kernels.train_step import (
            kernel_supported,
            make_kernel_denoise_body,
        )

        if not kernel_supported(model):
            raise ValueError(
                "cfg.train_kernel=True requires a shared_cond_proj "
                "single-condition variant (v1/v2); use the XLA path for v3"
            )
        denoise = make_kernel_denoise_body(
            model, cfg, dtype=getattr(jnp, cfg.train_kernel_dtype)
        )
    else:
        denoise = make_latent_denoise_body(model, cfg)
    # epoch-encode path: augment rows WITHOUT the per-row mesh constraint
    # (vmapped); the flat epoch batch is constrained once below.
    gather_row = _make_gather(augment, max_rotation_deg, jitter, mesh=None)

    def epochs_fn(state, vae_params, sched_arg, images_u8, labels_all,
                  colors_all, idx, offsets, rng, data_key, latent_stats):
        t = idx.shape[0]
        if t % steps_per_epoch != 0:
            raise ValueError(f"T={t} not a multiple of steps={steps_per_epoch}")
        e = t // steps_per_epoch
        bsz = idx.shape[1]
        idx_n = idx.reshape(e, steps_per_epoch, bsz)
        off_n = offsets.reshape(e, steps_per_epoch)

        def outer(st, xs_e):
            idx_e, off_e = xs_e
            # Per-row RNG: identical derivation to the per-step path —
            # fold_in(fold_in(rng, offset), state.step) with state.step
            # advancing by one per row within the epoch.
            row_steps = st.step + jnp.arange(steps_per_epoch, dtype=jnp.asarray(st.step).dtype)

            def row_keys_fn(o, s):
                return jax.random.split(
                    jax.random.fold_in(jax.random.fold_in(rng, o), s), 4
                )

            row_keys = jax.vmap(row_keys_fn)(off_e, row_steps)  # (S, 4) keys

            imgs_rows = jax.vmap(
                lambda ir, o: gather_row(images_u8, ir, data_key, o)
            )(idx_e, off_e)  # (S, B, H, W, C) float
            flat = imgs_rows.reshape((steps_per_epoch * bsz,) + imgs_rows.shape[2:])
            if mesh is not None:
                flat = jax.lax.with_sharding_constraint(
                    flat, NamedSharding(mesh, P("data", None, None, None))
                )
            z_flat_rows = lambda z: z.reshape(steps_per_epoch, bsz, -1)
            # ONE whole-epoch frozen encode; per-row reparameterization keys.
            mu_lv = enc_vae.apply(
                {"params": vae_params}, flat,
                method=type(enc_vae).encode_with_params,
            )
            mu = z_flat_rows(mu_lv[0].astype(jnp.float32))
            logvar = z_flat_rows(mu_lv[1].astype(jnp.float32))

            def reparam_row(k, m, lv):
                from flowerdiff.models.vae import FlowerVAE as _V
                return _V.reparameterize(k, m, lv)

            z = jax.vmap(reparam_row)(row_keys[:, 0], mu, logvar)
            z = jax.lax.stop_gradient(z)
            if latent_stats is not None:
                mean, std = latent_stats
                z = (z - mean) / std
            if mesh is not None:
                z = jax.lax.with_sharding_constraint(
                    z, NamedSharding(mesh, P(None, "data", None))
                )

            labs_rows = jax.vmap(lambda ir: jnp.take(labels_all, ir, axis=0))(idx_e)
            cols_rows = (
                jax.vmap(lambda ir: jnp.take(colors_all, ir, axis=0))(idx_e)
                if has_colors else None
            )

            def inner(st2, xs):
                if has_colors:
                    z_r, labs_r, cols_r, keys_r = xs
                else:
                    z_r, labs_r, keys_r = xs
                    cols_r = None
                if mesh is not None:
                    z_r = jax.lax.with_sharding_constraint(
                        z_r, NamedSharding(mesh, P("data", None))
                    )
                    labs_r = jax.lax.with_sharding_constraint(
                        labs_r, NamedSharding(mesh, P("data"))
                    )
                    if cols_r is not None:
                        cols_r = jax.lax.with_sharding_constraint(
                            cols_r, NamedSharding(mesh, P("data"))
                        )
                return denoise(st2, sched_arg, z_r, labs_r, cols_r,
                               keys_r[1], keys_r[2], keys_r[3])

            xs_in = ((z, labs_rows, cols_rows, row_keys) if has_colors
                     else (z, labs_rows, row_keys))
            return jax.lax.scan(inner, st, xs_in)

        state, losses = jax.lax.scan(outer, state, (idx_n, off_n))
        return state, losses.reshape(t)

    return jax.jit(epochs_fn, donate_argnums=(0,))


def make_latent_cache_builder(
    vae: FlowerVAE,
    cfg: LatentDiffusionConfig,
    augment: bool = True,
    max_rotation_deg: float = 10.0,
    jitter: float = 0.2,
    chunk: int = 255,
):
    """builder(vae_params, images_u8, rng, latent_stats) -> (K, N, latent)
    pool of frozen-VAE posterior draws, slot k holding one fresh
    augmentation+reparameterization draw of the WHOLE dataset.

    The dataset is encoded in `chunk`-sized pieces inside a scan (the
    rotation-augment einsum materializes a (B, H, W, H, C) intermediate, so
    whole-dataset batches blow past VMEM-friendly sizes). One dispatch
    builds all K slots. cfg.encode_dtype='bfloat16' applies (the pool and
    the noise draw stay f32 — make_latent_encode_fn)."""
    from flowerdiff.train.latent_ddpm import make_latent_encode_fn

    K = cfg.latent_cache
    assert K > 0, "latent_cache must be > 0 for the cached path"
    enc_vae = vae
    enc_dtype = getattr(cfg, "encode_dtype", None)
    if enc_dtype is not None and enc_dtype != "float32":
        enc_vae = vae.clone(dtype=getattr(jnp, enc_dtype))
    encode = make_latent_encode_fn(enc_vae)
    augment_fn = make_augment_fn(max_rotation_deg, jitter) if augment else None

    def builder(vae_params, images_u8, rng, latent_stats=None):
        n = images_u8.shape[0]
        steps = -(-n // chunk)
        pad = steps * chunk - n
        # wrap-pad so every chunk is full; duplicate tail rows overwrite
        # identically-valued slots on reassembly (sliced off below).
        idx_flat = jnp.arange(steps * chunk, dtype=jnp.int32) % n
        idx_rows = idx_flat.reshape(steps, chunk)

        def slot(carry, k):
            def body(c, xs):
                row_i, ir = xs
                key = jax.random.fold_in(jax.random.fold_in(rng, k), row_i)
                imgs = jnp.take(images_u8, ir, axis=0).astype(jnp.float32) / 255.0
                if augment_fn is not None:
                    a_key, e_key = jax.random.split(key)
                    imgs = augment_fn(imgs, a_key)
                else:
                    e_key = key
                z = encode(vae_params, imgs, e_key, latent_stats)
                return c, z

            _, zs = jax.lax.scan(
                body, 0, (jnp.arange(steps, dtype=jnp.int32), idx_rows)
            )
            return carry, zs.reshape(steps * chunk, -1)[:n]

        _, pool = jax.lax.scan(slot, 0, jnp.arange(K, dtype=jnp.int32))
        del pad
        return pool  # (K, N, latent)

    return jax.jit(builder)


def make_fused_cached_epochs(
    model: ConditionalLatentDenoiser,
    cfg: LatentDiffusionConfig,
    has_colors: bool = False,
    steps_per_epoch: int = 1,
):
    """fn(state, sched, z_pool (K,N,L), labels_all, colors_all, idx (T,B),
    offsets (T,), rng, pool_rng) -> (state, losses (T,)).

    The latent-cache training dispatch: per step, each sample draws a pool
    slot uniformly (fold_in(pool_rng, offset) — fresh per batch, like the
    augment keys) and the denoiser trains on the cached posterior draw. No
    VAE in the program: the epoch is denoiser-only (the reference's frozen
    encode, v1:1257-1259, is amortized into the cache builder). Uses the
    Pallas train kernel when cfg.train_kernel (single-chip fast path)."""
    from flowerdiff.train.latent_ddpm import make_latent_denoise_body

    K = cfg.latent_cache
    assert K > 0
    if getattr(cfg, "train_kernel", False):
        from flowerdiff.kernels.train_step import (
            kernel_supported,
            make_kernel_denoise_body,
        )

        assert kernel_supported(model), "train_kernel: v1/v2 variants only"
        denoise = make_kernel_denoise_body(
            model, cfg, dtype=getattr(jnp, cfg.train_kernel_dtype)
        )
    else:
        denoise = make_latent_denoise_body(model, cfg)

    def epochs_fn(state, sched_arg, z_pool, labels_all, colors_all, idx,
                  offsets, rng, pool_rng):
        n = z_pool.shape[1]
        pool_flat = z_pool.reshape(-1, z_pool.shape[-1])  # (K*N, L)

        def body(st, xs):
            idx_row, offset = xs
            slot = jax.random.randint(
                jax.random.fold_in(pool_rng, offset), idx_row.shape, 0, K
            )
            z_r = jnp.take(pool_flat, slot * n + idx_row, axis=0)
            labs = jnp.take(labels_all, idx_row, axis=0)
            cols = (jnp.take(colors_all, idx_row, axis=0)
                    if has_colors else None)
            step_key = jax.random.fold_in(
                jax.random.fold_in(rng, offset), st.step
            )
            _, loss_rng, drop_rng, cfg_rng = jax.random.split(step_key, 4)
            return denoise(st, sched_arg, z_r, labs, cols,
                           loss_rng, drop_rng, cfg_rng)

        return _nested_scan(body, state, (idx, offsets), steps_per_epoch)

    return jax.jit(epochs_fn, donate_argnums=(0,))


def make_fused_pixel_epochs(
    model: PixelUNet,
    cfg: PixelDiffusionConfig,
    augment: bool = True,
    max_rotation_deg: float = 10.0,
    jitter: float = 0.2,
    mesh: Optional[Mesh] = None,
    steps_per_epoch: int = 1,
):
    """fn(state, sched, images_u8, idx, offsets, rng, data_key)
    -> (state, losses (T,)). T = (whole epochs) x steps_per_epoch."""
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

        return _nested_scan(body, state, (idx, offsets), steps_per_epoch)

    return jax.jit(epochs_fn, donate_argnums=(0,))


def epoch_rows(
    rng, n: int, batch_size: int, epochs: int, shuffle: bool = True,
    drop_remainder: bool = True,
):
    """Host-side index plan: (T, B) dataset rows + (T,) globally unique RNG
    offsets (0..T-1) for `epochs` epochs over an n-item dataset (one
    permutation per epoch, same policy as DeviceDataset.batches). Offsets
    are unique across the WHOLE chunk so fold_in(data_key, offset) yields a
    fresh augmentation draw for every batch of every epoch.

    With drop_remainder=False the short tail batch is padded by WRAPPING
    rows from the start of the same epoch's permutation (static batch shape
    for the scan), so tail-epoch samples are seen twice per epoch — unlike
    the loop path, which yields a short final batch. No trainer currently
    uses this branch; it exists for static-shape callers that prefer
    duplicate samples over dropped ones."""
    import numpy as np

    if isinstance(rng, (int, np.integer)):
        rng = np.random.default_rng(int(rng))
    steps = n // batch_size if drop_remainder else -(-n // batch_size)
    if steps == 0:
        steps = 1
        batch_size = n
    idx = np.empty((epochs * steps, batch_size), np.int32)
    for e in range(epochs):
        order = rng.permutation(n) if shuffle else np.arange(n)
        for s in range(steps):
            row = order[s * batch_size:(s + 1) * batch_size]
            if len(row) < batch_size:  # wrap the tail (only if not dropping)
                row = np.concatenate([row, order[:batch_size - len(row)]])
            idx[e * steps + s] = row
    offsets = np.arange(epochs * steps, dtype=np.int32)
    return jnp.asarray(idx), jnp.asarray(offsets), steps
