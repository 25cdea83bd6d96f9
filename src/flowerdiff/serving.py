"""Production sampling service.

The deployment-facing API over the fastest inference path: the whole-reverse-
process Pallas kernel (kernels/full_sampler.py) for the latent DDPM plus the
jitted VAE decoder. One `SamplingService` holds prepared bf16 weights and
compiled programs; request latency at reference width is ~3 ms for a 50-image
class-conditional batch of 1000-step ancestral samples on one TPU v5e chip
(see BASELINE.md), ~10 ms including decode.

Example:
    service = SamplingService(model, params, vae, vae_params)
    images = service.sample_classes([0, 5, 17], n_per_class=5,
                                    rng=jax.random.key(0))
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from flowerdiff.diffusion import DiffusionSchedule, linear_schedule
from flowerdiff.diffusion.api import DiffusionSampler, FusedDiffusionSampler
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser
from flowerdiff.models.vae import FlowerVAE


class SamplingService:
    def __init__(
        self,
        model: ConditionalLatentDenoiser,
        params: dict,
        vae: FlowerVAE,
        vae_params: dict,
        sched: Optional[DiffusionSchedule] = None,
        use_fused: Optional[bool] = None,
    ):
        self.model = model
        self.params = params
        self.sched = sched or linear_schedule()
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        self.use_fused = use_fused
        cls = FusedDiffusionSampler if use_fused else DiffusionSampler
        self.sampler = cls(model, params, self.sched, (model.latent_dim,))
        self._vae_params = (
            vae_params if "params" in vae_params else {"params": vae_params}
        )
        # params as jit arguments (closure constants would be re-staged per
        # call and blow up compile time)
        self._decode_jit = jax.jit(
            lambda vp, z: vae.apply(vp, z, method=FlowerVAE.decode)
        )
        self._decode = lambda z: self._decode_jit(self._vae_params, z)

    def sample_latents(
        self,
        classes: jax.Array,
        rng: jax.Array,
        colors: Optional[jax.Array] = None,
    ) -> jax.Array:
        cond = (classes,) if colors is None else (classes, colors)
        return self.sampler.sample(rng, classes.shape[0], *cond)

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
        latents = self.sample_latents(classes, rng, color_arr)
        return self._decode(latents)
