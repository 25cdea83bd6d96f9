"""Production sampling service.

The deployment-facing API over the fastest inference path: the whole-reverse-
process Pallas kernel (kernels/full_sampler.py) for the latent DDPM plus the
jitted VAE decoder. One `SamplingService` holds prepared bf16 weights and
compiled programs; request latency at reference width is ~3 ms for a 50-image
class-conditional batch of 1000-step ancestral samples on one TPU v5e chip
(see BASELINE.md), ~10 ms including decode.

Batch bucketing: every sampling program specializes on the (static) batch
size, so serving arbitrary request sizes naively would recompile per new
size (a multi-second Pallas/XLA compile mid-request). Requests are instead
padded up to a small ladder of bucket sizes and sliced back after decode —
any request size compiles at most `len(buckets)` programs, and `warmup()`
pre-compiles chosen buckets at deploy time so no request ever pays a
compile.

Example:
    service = SamplingService(model, params, vae, vae_params)
    service.warmup(jax.random.key(0), buckets=(16, 64))   # optional
    images = service.sample_classes([0, 5, 17], n_per_class=5,
                                    rng=jax.random.key(0))
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from flowerdiff.diffusion import DiffusionSchedule, linear_schedule
from flowerdiff.diffusion.api import DiffusionSampler, FusedDiffusionSampler
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser
from flowerdiff.models.vae import FlowerVAE

DEFAULT_BUCKETS = (8, 16, 32, 64, 128, 256, 512)


class SamplingService:
    def __init__(
        self,
        model: ConditionalLatentDenoiser,
        params: dict,
        vae: FlowerVAE,
        vae_params: dict,
        sched: Optional[DiffusionSchedule] = None,
        use_fused: Optional[bool] = None,
        buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
        latent_stats=None,
        clip_x0: Optional[float] = None,
    ):
        """latent_stats: (mean, std) per-dim arrays when the model was
        trained z-scored (runner saves them as latent_stats.npz).
        clip_x0: sampling-time x0-thresholding bound (match the training
        preset's clip_denoised)."""
        self.model = model
        self.params = params
        self.sched = sched or linear_schedule()
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        self.use_fused = use_fused
        self.buckets = tuple(sorted(buckets))
        assert self.buckets, "need at least one bucket size"
        cls = FusedDiffusionSampler if use_fused else DiffusionSampler
        self.sampler = cls(model, params, self.sched, (model.latent_dim,),
                           clip_x0=clip_x0)
        if latent_stats is not None:
            from flowerdiff.diffusion.api import NormalizedSampler

            self.sampler = NormalizedSampler(self.sampler, *latent_stats)
        self._vae_params = (
            vae_params if "params" in vae_params else {"params": vae_params}
        )
        # params as jit arguments (closure constants would be re-staged per
        # call and blow up compile time)
        self._decode_jit = jax.jit(
            lambda vp, z: vae.apply(vp, z, method=FlowerVAE.decode)
        )
        self._decode = lambda z: self._decode_jit(self._vae_params, z)

    def bucket_size(self, n: int) -> int:
        """Smallest bucket >= n; oversize requests round up to a multiple of
        the largest bucket (processed as one padded mega-batch)."""
        for b in self.buckets:
            if n <= b:
                return b
        top = self.buckets[-1]
        return ((n + top - 1) // top) * top

    def warmup(
        self,
        rng: jax.Array,
        buckets: Optional[Sequence[int]] = None,
        with_colors: bool = False,
    ) -> None:
        """Pre-compile the sampling + decode programs for the given buckets
        (default: all) so no live request pays a compile."""
        for b in buckets or self.buckets:
            classes = jnp.zeros((b,), jnp.int32)
            colors = jnp.zeros((b,), jnp.int32) if with_colors else None
            self._decode(self.sample_latents(classes, rng, colors)).block_until_ready()

    def _pad(self, arr: jax.Array, target: int) -> jax.Array:
        n = arr.shape[0]
        if n == target:
            return arr
        return jnp.concatenate([arr, jnp.zeros((target - n,), arr.dtype)])

    def sample_latents(
        self,
        classes: jax.Array,
        rng: jax.Array,
        colors: Optional[jax.Array] = None,
    ) -> jax.Array:
        n = classes.shape[0]
        b = self.bucket_size(n)
        classes_p = self._pad(jnp.asarray(classes, jnp.int32), b)
        cond = (classes_p,)
        if colors is not None:
            cond = (classes_p, self._pad(jnp.asarray(colors, jnp.int32), b))
        return self.sampler.sample(rng, b, *cond)[:n]

    def sample_classes(
        self,
        class_ids: Sequence[int],
        n_per_class: int,
        rng: jax.Array,
        colors: Optional[Sequence[int]] = None,
    ) -> jax.Array:
        """Decoded (N, 64, 64, 3) images, one row block per requested class."""
        classes = jnp.repeat(jnp.asarray(class_ids, jnp.int32), n_per_class)
        color_arr = (
            jnp.repeat(jnp.asarray(colors, jnp.int32), n_per_class)
            if colors is not None else None
        )
        n = classes.shape[0]
        b = self.bucket_size(n)
        # Pad through sampling AND decode so both programs see bucket shapes.
        classes_p = self._pad(classes, b)
        cond = (classes_p,)
        if color_arr is not None:
            cond = (classes_p, self._pad(color_arr, b))
        latents = self.sampler.sample(rng, b, *cond)
        return self._decode(latents)[:n]
