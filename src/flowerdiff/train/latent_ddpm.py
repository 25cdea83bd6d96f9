"""Latent-space conditional DDPM training.

Parity target: train_conditional_diffusion (v1/model_train_test.py:1241-1285;
v3:1541-1587 for the dual-condition variant): the VAE is frozen
(`autoencoder.eval()`, encode under no_grad, v1:1257-1259); AdamW(1e-3,
wd 1e-5) + CosineAnnealingWarmRestarts(T_0=10, T_mult=2) stepped per epoch;
grad-clip 1.0; euclidean epsilon-loss at uniform random timesteps.

TPU-first: the frozen-VAE encode, reparameterization, q_sample, denoiser
forward, loss, and optimizer update are ONE jitted function — the frozen
encoder runs under stop_gradient inside the same XLA program (no separate
no_grad pass, no host round-trip for the latents).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState

from flowerdiff.diffusion import DiffusionSchedule, ddpm_eps_loss, linear_schedule
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser
from flowerdiff.models.vae import FlowerVAE
from flowerdiff.train.schedules import cosine_warm_restarts_schedule


@dataclasses.dataclass(frozen=True)
class LatentDiffusionConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-5
    grad_clip: float = 1.0
    n_steps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    t0: int = 10  # warm-restart period (epochs)
    t_mult: int = 2
    steps_per_epoch: int = 16  # Flowers102 train: 1020 imgs / batch 64
    latent_dim: int = 256
    hidden_dims: tuple = (256, 512, 1024, 512, 256)
    time_emb_dim: int = 256
    num_classes: int = 102
    num_colors: Optional[int] = None  # 10 for the v3 preset
    dropout_rate: float = 0.3
    shared_cond_proj: bool = True
    global_skip: bool = False  # True for the v2 preset
    compute_dtype: str = "float32"
    # Train the DDPM in per-dim z-scored latent space (the reference's
    # intended-but-dead check_and_normalize_latent, v1:1195-1201). Stats are
    # computed by the runner from the trained VAE's posterior and threaded
    # through the step; sampling denormalizes (diffusion/api.py
    # NormalizedSampler). Measured effect: artifacts/demo_v1_ref vs the
    # normalized rerun (quality metrics in sample_quality.jsonl).
    normalize_latents: bool = False
    # Sampling-time x0-thresholding bound (ddpm.clip_eps_for_x0), in z-scored
    # units when normalize_latents. None = the reference's unclipped sampler.
    clip_denoised: Optional[float] = None
    # Classifier-free guidance (beyond-reference): cond_dropout is the
    # per-sample probability of training with the null condition;
    # guidance_scale > 1 sharpens class identity at sampling (api.py
    # _compiled). 0.0/None reproduce the reference's plain conditioning.
    cond_dropout: float = 0.0
    guidance_scale: Optional[float] = None
    # Sampler for grids/serving sweeps: 'ancestral' (the reference's 1000
    # sequential steps) or 'ddim' over `ddim_steps` strided timesteps
    # (diffusion/sampler.py ddim_sample — fast-preview capability the
    # reference lacks). Trajectory/denoise-path viz stays ancestral.
    sampler: str = "ancestral"
    ddim_steps: int = 50
    # Per-step exponential moving average of the denoiser weights
    # (beyond-reference lever from artifacts/cond_sweep_r3: worth ~+0.01
    # accuracy at shallow horizons, ~nil at saturation). None = off (exact
    # reference semantics). When set, sampling uses the EMA weights.
    ema_decay: Optional[float] = None
    # Fused-epoch restructure: encode the whole epoch's augmented images
    # through the frozen VAE in ONE batched call per epoch instead of per
    # step (train/fused.py make_fused_latent_epochs). Per-sample semantics
    # identical (same augment + reparameterization keys); the per-step b64
    # encode runs ~37% MFU vs 45-65% at epoch batch
    # (artifacts/decompose_latent_r4.json).
    epoch_encode: bool = False
    # Compute dtype for the frozen encoder in the epoch_encode path only
    # ('bfloat16' measured 57% vs 42% MFU at epoch batch); None keeps the
    # VAE's own dtype. The posterior noise draw stays float32 either way.
    encode_dtype: Optional[str] = None
    # Fused Pallas forward+backward train kernel (kernels/train_step.py):
    # runs the whole denoiser objective (q_sample, embeddings, hourglass,
    # dropout, loss, backward) as ONE VMEM-resident kernel; optimizer stays
    # the optax chain. Requires epoch_encode and a shared_cond_proj
    # single-condition variant (v1/v2); timestep/noise draws match the XLA
    # step bitwise, dropout masks are an equivalent-but-different stream.
    train_kernel: bool = False
    # Matmul operand dtype inside the train kernel ('bfloat16' fast path;
    # 'float32' matches the XLA step numerically — test lane).
    train_kernel_dtype: str = "bfloat16"
    # Latent cache: the VAE is FROZEN during diffusion training
    # (v1:1257-1259), so its posterior draws can be precomputed. K>0 keeps a
    # pool of K augmented encodes per image on device ((K, N, latent) — a
    # few MB) and each epoch samples one pool slot per sample instead of
    # re-encoding: the 159-of-164 GFLOP frozen encode leaves the epoch
    # entirely (artifacts/decompose_latent_r4.json). Semantics change:
    # augmentation variety per image is K draws (refreshed every
    # cache_refresh_epochs) instead of one fresh draw per epoch — an
    # opt-in speed/variety trade the reference cannot express; quality
    # validated in artifacts (see BASELINE.md round 4). 0 = off.
    latent_cache: int = 0
    # Rebuild the cache with fresh augmentation draws every R epochs
    # (0 = build once). Amortized refresh cost: ~K*21ms/R at reference size.
    cache_refresh_epochs: int = 0


class EMATrainState(TrainState):
    """TrainState that also advances an EMA copy of `params` on every
    `apply_gradients` — so the per-batch loop AND the fused whole-epoch
    scan dispatches (train/fused.py, which carry this state as a pytree)
    get per-STEP EMA without touching their step bodies. `ema_params` is a
    pytree leaf (checkpointed for exact resume); `ema_decay` is static."""

    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, *, grads, **kwargs):
        new = super().apply_gradients(grads=grads, **kwargs)
        if self.ema_params is not None:
            d = self.ema_decay
            new = new.replace(ema_params=jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p,
                self.ema_params, new.params,
            ))
        return new


def create_latent_diffusion_state(
    rng: jax.Array, cfg: LatentDiffusionConfig
) -> tuple[TrainState, ConditionalLatentDenoiser, DiffusionSchedule]:
    model = ConditionalLatentDenoiser(
        latent_dim=cfg.latent_dim,
        hidden_dims=cfg.hidden_dims,
        time_emb_dim=cfg.time_emb_dim,
        num_classes=cfg.num_classes,
        num_colors=cfg.num_colors,
        dropout_rate=cfg.dropout_rate,
        shared_cond_proj=cfg.shared_cond_proj,
        global_skip=cfg.global_skip,
        dtype=None if cfg.compute_dtype == "float32" else getattr(jnp, cfg.compute_dtype),
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            cosine_warm_restarts_schedule(
                cfg.lr, cfg.steps_per_epoch, cfg.t0, cfg.t_mult
            ),
            weight_decay=cfg.weight_decay,
        ),
    )

    # One jitted program for init + optimizer-moment zeros (eager flax init
    # dispatches hundreds of tiny programs; see create_vae_gan_state).
    def _build(r):
        dummy_z = jnp.zeros((1, cfg.latent_dim), jnp.float32)
        dummy_t = jnp.zeros((1,), jnp.int32)
        dummy_c = jnp.zeros((1,), jnp.int32)
        if cfg.num_colors is not None:
            params = model.init(r, dummy_z, dummy_t, dummy_c, dummy_c)["params"]
        else:
            params = model.init(r, dummy_z, dummy_t, dummy_c)["params"]
        if cfg.ema_decay is not None:
            return EMATrainState.create(
                apply_fn=model.apply, params=params, tx=tx,
                ema_params=params, ema_decay=float(cfg.ema_decay),
            )
        return TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    state = jax.jit(_build)(rng)
    sched = linear_schedule(cfg.n_steps, cfg.beta_start, cfg.beta_end)
    return state, model, sched


def make_latent_encode_fn(vae: FlowerVAE):
    """Frozen-VAE posterior draw (v1:1257-1259) as a standalone traceable fn:
    encode(vae_params, images, enc_rng, latent_stats) -> z (stop-gradient,
    z-scored when latent_stats is given). mu/logvar are cast to float32
    BEFORE the reparameterization so a reduced-precision encoder (the fused
    epoch path's bf16 option) changes only conv compute precision, never the
    noise draw's dtype/stream."""

    def encode(vae_params, images, enc_rng, latent_stats=None):
        mu, logvar = vae.apply(
            {"params": vae_params}, images, method=FlowerVAE.encode_with_params
        )
        mu = mu.astype(jnp.float32)
        logvar = logvar.astype(jnp.float32)
        z = FlowerVAE.reparameterize(enc_rng, mu, logvar)
        z = jax.lax.stop_gradient(z)
        if latent_stats is not None:
            mean, std = latent_stats
            z = (z - mean) / std
        return z

    return encode


def make_latent_denoise_body(
    model: ConditionalLatentDenoiser, cfg: LatentDiffusionConfig
):
    """The trainable half of the latent step, on a PRE-ENCODED latent batch:
    denoise(state, sched_arg, z, labels, colors, loss_rng, drop_rng, cfg_rng)
    -> (state, loss). Split out of make_latent_diffusion_step_body so the
    fused epoch path can batch the frozen encode once per epoch and scan
    only this part per step."""

    def denoise(state: TrainState, sched_arg, z, labels, colors,
                loss_rng, drop_rng, cfg_rng):
        cond_mask = None
        if cfg.cond_dropout > 0.0:
            keep = jax.random.bernoulli(
                cfg_rng, 1.0 - cfg.cond_dropout, (z.shape[0],)
            )
            cond_mask = keep.astype(jnp.float32)

        def loss_fn(params):
            def eps_fn(xt, t, *cond):
                return model.apply(
                    {"params": params}, xt, t, *cond,
                    deterministic=False, rngs={"dropout": drop_rng},
                    cond_mask=cond_mask,
                )

            cond = (labels,) if colors is None else (labels, colors)
            return ddpm_eps_loss(
                sched_arg, eps_fn, loss_rng, z, *cond, distance="euclidean"
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return denoise


def make_latent_diffusion_step_body(
    model: ConditionalLatentDenoiser,
    vae: FlowerVAE,
    sched: DiffusionSchedule,
    cfg: LatentDiffusionConfig,
):
    """UN-jitted step (traceable; jitted standalone by
    make_latent_diffusion_step, or scanned by train/fused.py):
    step(state, vae_params, images, labels[, colors], rng) -> (state, loss).

    vae_params are an argument (not a closure constant) so the frozen encoder
    weights live in HBM once and the step never recompiles when they change.
    """
    encode = make_latent_encode_fn(vae)
    denoise = make_latent_denoise_body(model, cfg)

    def step(state: TrainState, vae_params, sched_arg, images, labels, colors,
             rng, latent_stats=None):
        # the schedule tables arrive as ARGUMENTS: on the axon platform,
        # programs with embedded array constants pay a large per-call penalty
        rng = jax.random.fold_in(rng, state.step)
        enc_rng, loss_rng, drop_rng, cfg_rng = jax.random.split(rng, 4)
        z = encode(vae_params, images, enc_rng, latent_stats)
        return denoise(state, sched_arg, z, labels, colors,
                       loss_rng, drop_rng, cfg_rng)

    return step


def make_latent_diffusion_step(
    model: ConditionalLatentDenoiser,
    vae: FlowerVAE,
    sched: DiffusionSchedule,
    cfg: LatentDiffusionConfig,
):
    """Jitted single-batch step (see make_latent_diffusion_step_body)."""
    return jax.jit(
        make_latent_diffusion_step_body(model, vae, sched, cfg),
        donate_argnums=(0,),
    )


class LatentDiffusionTrainer:
    def __init__(self, cfg: LatentDiffusionConfig, vae: FlowerVAE, rng: jax.Array,
                 latent_stats=None):
        """latent_stats: optional (mean, std) per-dim arrays for z-scored
        training (cfg.normalize_latents); supplied by the runner from the
        trained VAE posterior."""
        self.cfg = cfg
        self.state, self.model, self.sched = create_latent_diffusion_state(rng, cfg)
        self.vae = vae
        self.latent_stats = latent_stats if cfg.normalize_latents else None
        if cfg.normalize_latents and latent_stats is None:
            raise ValueError(
                "cfg.normalize_latents=True requires latent_stats (mean, std)"
            )
        self._step = make_latent_diffusion_step(self.model, vae, self.sched, cfg)
        self._fused = {}  # (T, B, augment) -> jitted multi-epoch fn
        self._z_pool = None  # latent-cache pool (cfg.latent_cache > 0)
        self._pool_age = 0  # epochs trained since the pool was built
        self._pool_builds = 0

    def run_epoch(self, batches, vae_params, rng: jax.Array) -> float:
        total, count = None, 0
        for i, batch in enumerate(batches):
            if self.cfg.num_colors is not None:
                images, labels, colors = batch
            else:
                images, labels = batch
                colors = None
            self.state, loss = self._step(
                self.state, vae_params, self.sched, images, labels, colors,
                jax.random.fold_in(rng, i), self.latent_stats,
            )
            total = loss if total is None else total + loss
            count += 1
        return float(total) / count

    def run_epochs_fused(self, dataset, epochs: int, vae_params,
                         rng: jax.Array, batch_size: int = 64, mesh=None):
        """Train `epochs` epochs in ONE device dispatch (train/fused.py).
        `dataset` is a data.DeviceDataset (with colors for the v3 preset).
        Returns per-epoch mean losses (one host fetch for the chunk).

        With cfg.latent_cache > 0 this routes to the latent-cache path
        (run_epochs_cached): denoiser-only epochs over a pool of frozen-VAE
        posterior draws, refreshed every cfg.cache_refresh_epochs."""
        import numpy as np

        from flowerdiff.train.fused import epoch_rows, make_fused_latent_epochs

        if self.cfg.latent_cache > 0:
            # a 1x1 mesh is how the runner spells "single chip" — allowed
            if mesh is not None and mesh.devices.size > 1:
                raise ValueError(
                    "latent_cache is the single-chip fast path; use the "
                    "uncached fused path under a multi-device mesh")
            return self.run_epochs_cached(dataset, epochs, vae_params, rng,
                                          batch_size=batch_size)

        host_seed = int(jax.random.randint(
            jax.random.fold_in(rng, 1), (), 0, 2**31 - 1
        ))
        idx, offsets, steps = epoch_rows(host_seed, dataset.n, batch_size, epochs)

        has_colors = self.cfg.num_colors is not None
        key = (idx.shape[0], idx.shape[1], steps, dataset.augment_enabled,
               mesh is not None)
        if key not in self._fused:
            self._fused[key] = make_fused_latent_epochs(
                self.model, self.vae, self.sched, self.cfg,
                has_colors=has_colors, augment=dataset.augment_enabled,
                max_rotation_deg=dataset.max_rotation_deg,
                jitter=dataset.jitter, mesh=mesh, steps_per_epoch=steps,
            )
        step_rng, data_key = jax.random.split(jax.random.fold_in(rng, 2))
        self.state, losses = self._fused[key](
            self.state, vae_params, self.sched, dataset.images, dataset.labels,
            dataset.colors if has_colors else None, idx, offsets,
            step_rng, data_key, self.latent_stats,
        )
        losses = np.asarray(jax.device_get(losses)).reshape(epochs, steps)
        return losses.mean(axis=1).tolist()

    def run_epochs_cached(self, dataset, epochs: int, vae_params,
                          rng: jax.Array, batch_size: int = 64):
        """Latent-cache training (cfg.latent_cache = K pool slots): the
        frozen-VAE encode leaves the epoch entirely — denoiser-only fused
        dispatches over cached posterior draws, pool refreshed with fresh
        augmentation draws every cfg.cache_refresh_epochs (0 = never).
        Returns per-epoch mean losses like run_epochs_fused."""
        import numpy as np

        from flowerdiff.train.fused import (
            epoch_rows,
            make_fused_cached_epochs,
            make_latent_cache_builder,
        )

        cfg = self.cfg
        has_colors = cfg.num_colors is not None
        refresh = cfg.cache_refresh_epochs
        if "cache_builder" not in self._fused:
            self._fused["cache_builder"] = make_latent_cache_builder(
                self.vae, cfg, augment=dataset.augment_enabled,
                max_rotation_deg=dataset.max_rotation_deg,
                jitter=dataset.jitter,
            )
        builder = self._fused["cache_builder"]

        # The per-take loop below must stay free of device round-trips so
        # that successive pool-refresh-window dispatches ENQUEUE back-to-back
        # and the chip never idles between them (round 5: the flagship's
        # steady 19.3 ms/epoch vs the 6.7 ms chained measurement was
        # per-chunk host synchronization — a device randint fetch for the
        # shuffle seed and a blocking loss fetch per refresh window, each a
        # full tunnel round-trip that serialized the pipeline). One key_data
        # fetch up front seeds a deterministic host-side shuffle stream; the
        # loss fetch moves to one drain after every dispatch is in flight.
        key_words = np.asarray(jax.random.key_data(rng)).ravel().tolist()

        losses_out = []
        pending = []  # (device losses, take, steps) per dispatched window
        done = 0
        while done < epochs:
            if self._z_pool is None or (refresh > 0
                                        and self._pool_age >= refresh):
                self._z_pool = builder(
                    vae_params, dataset.images,
                    jax.random.fold_in(jax.random.fold_in(rng, 7),
                                       self._pool_builds),
                    self.latent_stats,
                )
                self._pool_age = 0
                self._pool_builds += 1
            take = epochs - done
            if refresh > 0:
                take = min(take, refresh - self._pool_age)

            host_seed = int(np.random.default_rng(
                key_words + [done]).integers(0, 2**31 - 1))
            idx, offsets, steps = epoch_rows(host_seed, dataset.n,
                                             batch_size, take)
            key = ("cached", idx.shape[0], idx.shape[1], steps)
            if key not in self._fused:
                self._fused[key] = make_fused_cached_epochs(
                    self.model, cfg, has_colors=has_colors,
                    steps_per_epoch=steps,
                )
            step_rng, pool_rng = jax.random.split(
                jax.random.fold_in(jax.random.fold_in(rng, 2), done))
            self.state, losses = self._fused[key](
                self.state, self.sched, self._z_pool, dataset.labels,
                dataset.colors if has_colors else None, idx, offsets,
                step_rng, pool_rng,
            )
            pending.append((losses, take, steps))
            done += take
            self._pool_age += take
        for losses, take, steps in pending:
            host = np.asarray(jax.device_get(losses)).reshape(take, steps)
            losses_out.extend(host.mean(axis=1).tolist())
        return losses_out

    @property
    def sampling_params(self):
        """EMA weights when cfg.ema_decay is set, else the live weights."""
        ema = getattr(self.state, "ema_params", None)
        return ema if ema is not None else self.state.params

    def sampler(self, fused: bool = False):
        """Jitted sampling facade over the sampling params — the EMA weights
        when cfg.ema_decay is set (diffusion/api.py); wrapped in the latent
        codec when training is z-scored, and in the DDIM view when the
        preset selects the accelerated sampler."""
        from flowerdiff.diffusion.api import (
            DDIMSampler,
            DiffusionSampler,
            FusedDiffusionSampler,
            NormalizedSampler,
        )

        cls = FusedDiffusionSampler if fused else DiffusionSampler
        sampler = cls(self.model, {"params": self.sampling_params}, self.sched,
                      (self.cfg.latent_dim,), clip_x0=self.cfg.clip_denoised,
                      guidance_scale=self.cfg.guidance_scale)
        if self.latent_stats is not None:
            sampler = NormalizedSampler(sampler, *self.latent_stats)
        if self.cfg.sampler == "ddim":
            sampler = DDIMSampler(sampler, num_steps=self.cfg.ddim_steps)
        return sampler

    def eps_fn(self, params=None, deterministic: bool = True):
        params = self.sampling_params if params is None else params

        def fn(xt, t, *cond):
            return self.model.apply({"params": params}, xt, t, *cond,
                                    deterministic=deterministic)

        return fn
