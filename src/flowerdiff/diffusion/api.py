"""Jit-compiled sampling facade.

Everything downstream (viz, runner, serving, bench) samples through a
`DiffusionSampler`: a thin object holding (model, params, schedule) whose
methods are jit-compiled WITH THE PARAMS AS ARGUMENTS. This matters twice:

  - closing over a parameter tree inside jit turns it into XLA constants:
    measured on the VAE decoder, that is ~480s of extra compile time and a
    ~400x slower executable (weights re-staged per call);
  - an un-jitted `lax.scan` with closed-over params re-traces whenever the
    params object changes — i.e. a full recompile at every visualization
    cadence during training.

The compiled programs are cached per (model config, event shape), with the
schedule tables passed as arguments — constructing a fresh sampler for
updated params (every viz cadence) reuses the executables.

`FusedDiffusionSampler` swaps the ancestral `sample` for the whole-process
Pallas kernel (kernels/full_sampler.py) where available; all other paths
fall back to the XLA scan.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from flowerdiff.diffusion.ddpm import p_sample
from flowerdiff.diffusion.sampler import (
    ddim_sample,
    sample as _sample_impl,
    sample_with_trajectory as _traj_impl,
)
from flowerdiff.diffusion.schedule import DiffusionSchedule


def _masked_scan(sched, eps_fn, rng, x_init, t_start, *cond, clip_x0=None):
    """Shared full-length scan where chain i only updates once t <= t_start_i.
    Timestep is carried (no embedded arange constant — axon penalty)."""

    def step(carry, _):
        x, key, t = carry
        key, nkey = jax.random.split(key)
        t_vec = jnp.full((x.shape[0],), t, jnp.int32)
        eps_theta = eps_fn(x, t_vec, *cond)
        noise = jax.random.normal(nkey, x.shape, dtype=x.dtype)
        new_x = p_sample(sched, x, t_vec, eps_theta, noise, clip_x0)
        active = (t <= t_start).reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        return (x * (1 - active) + new_x * active, key, t - 1), None

    t0 = jnp.int32(sched.n_steps - 1)
    (x, _, _), _ = jax.lax.scan(step, (x_init, rng, t0), None,
                                length=sched.n_steps)
    return x


@functools.lru_cache(maxsize=64)
def _compiled(model, event_shape: tuple, clip_x0, guidance_scale=None):
    """Build (and cache) the jitted sampling programs for a
    model/shape/clipping/guidance combination. The schedule tables enter every
    program as ARGUMENTS — embedded array constants carry a large per-call
    penalty on the axon TPU platform (see BASELINE.md).

    guidance_scale (classifier-free guidance, Ho & Salimans 2022): the model
    runs on a doubled batch — conditional and null-condition halves — and
    eps = eps_u + s * (eps_c - eps_u). Requires a model trained with
    condition dropout (LatentDiffusionConfig.cond_dropout)."""

    if guidance_scale is None:
        def eps(p, x, t, *cond):
            return model.apply(p, x, t, *cond)
    else:
        s = float(guidance_scale)

        def eps(p, x, t, *cond):
            b = x.shape[0]
            x2 = jnp.concatenate([x, x])
            t2 = jnp.concatenate([t, t])
            cond2 = tuple(jnp.concatenate([c, c]) for c in cond)
            mask = jnp.concatenate(
                [jnp.ones((b,), jnp.float32), jnp.zeros((b,), jnp.float32)]
            )
            e = model.apply(p, x2, t2, *cond2, cond_mask=mask)
            e_c, e_u = e[:b], e[b:]
            return e_u + s * (e_c - e_u)

    @functools.partial(jax.jit, static_argnames=("batch",))
    def sample_jit(p, sched, key, batch, *cond):
        return _sample_impl(
            sched, functools.partial(eps, p), key, (batch,) + event_shape,
            *cond, clip_x0=clip_x0,
        )

    @jax.jit
    def masked_jit(p, sched, key, x_init, t_start_vec, *cond):
        return _masked_scan(
            sched, functools.partial(eps, p), key, x_init, t_start_vec, *cond,
            clip_x0=clip_x0,
        )

    @functools.partial(jax.jit, static_argnames=("batch",))
    def traj_jit(p, sched, key, batch, *cond):
        return _traj_impl(
            sched, functools.partial(eps, p), key, (batch,) + event_shape,
            *cond, clip_x0=clip_x0,
        )

    @functools.partial(jax.jit, static_argnames=("batch", "num_steps"))
    def ddim_jit(p, sched, key, batch, num_steps, *cond):
        return ddim_sample(
            sched, functools.partial(eps, p), key, (batch,) + event_shape,
            *cond, num_steps=num_steps, clip_x0=clip_x0,
        )

    eps_jit = jax.jit(eps)
    return sample_jit, masked_jit, traj_jit, ddim_jit, eps_jit


class DiffusionSampler:
    """Sampling entry points for one (model, params, schedule) triple.

    `event_shape` is the per-sample state shape: (latent_dim,) for the latent
    pipeline, (H, W, C) for the pixel pipeline. Conditioning is variadic —
    () for the pixel model, (classes,) for v1/v2, (classes, colors) for v3.
    """

    def __init__(
        self,
        model,
        params: dict,
        sched: DiffusionSchedule,
        event_shape: Tuple[int, ...],
        clip_x0: float | None = None,
        guidance_scale: float | None = None,
    ):
        """clip_x0: static x0-thresholding bound applied at every reverse
        step (ddpm.clip_eps_for_x0); None reproduces the reference's
        unclipped sampler exactly. guidance_scale: classifier-free guidance
        (see _compiled); None = plain conditional sampling."""
        self.model = model
        self.params = params if "params" in params else {"params": params}
        self.sched = sched
        self.event_shape = tuple(event_shape)
        self.clip_x0 = clip_x0
        self.guidance_scale = guidance_scale
        (self._sample_jit, self._masked_jit, self._traj_jit, self._ddim_jit,
         self._eps_jit) = _compiled(model, self.event_shape, clip_x0,
                                    guidance_scale)

    def sample(self, rng: jax.Array, batch: int, *cond) -> jax.Array:
        """Full ancestral sampling (v1:594-598) in one compiled program."""
        return self._sample_jit(self.params, self.sched, rng, batch, *cond)

    def sample_from(self, rng, x_t, t_start: int, *cond) -> jax.Array:
        """Denoise x_t from `t_start` down to 0."""
        t_vec = jnp.full((x_t.shape[0],), t_start, jnp.int32)
        return self._masked_jit(self.params, self.sched, rng, x_t, t_vec, *cond)

    def masked_denoise(self, rng, x_init, t_start_vec, *cond) -> jax.Array:
        """Per-chain start times in one shared scan (viz/denoise_path.py)."""
        return self._masked_jit(self.params, self.sched, rng, x_init,
                                t_start_vec, *cond)

    def sample_with_trajectory(self, rng, batch: int, *cond):
        return self._traj_jit(self.params, self.sched, rng, batch, *cond)

    def ddim(self, rng, batch: int, *cond, num_steps: int = 50) -> jax.Array:
        return self._ddim_jit(self.params, self.sched, rng, batch, num_steps,
                              *cond)

    def eps(self, x, t, *cond) -> jax.Array:
        """Single jitted denoiser evaluation."""
        return self._eps_jit(self.params, x, t, *cond)

    @property
    def latent_dim(self) -> int:
        assert len(self.event_shape) == 1
        return self.event_shape[0]


class NormalizedSampler:
    """Latent-space codec around a sampler (the reference's intended-but-dead
    `check_and_normalize_latent`, v1:1195-1201, made real).

    The DDPM is trained in PER-DIM Z-SCORED latent space — the VAE posterior
    is anisotropic (per-dim std 0.8-3.2 measured at reference depth) and
    off-unit-scale, which leaves the reverse process mismatched against its
    N(0,1) terminal distribution and lets underfit eps error amplify
    (measured: generated latents at 30x the real scale after a
    reference-schedule run; quality metrics caught it — utils/quality.py).

    Contract: OUTPUTS are always denormalized to raw VAE-latent space (ready
    for decode). `masked_denoise`/`sample_from` INPUTS are model-space
    (unit-noise-scale) chains — their callers start from N(0,1) draws
    (viz/denoise_path.py:59-64). `eps` stays model-space.
    """

    def __init__(self, inner: DiffusionSampler, mean: jax.Array, std: jax.Array):
        self._inner = inner
        self.mean = jnp.asarray(mean, jnp.float32)
        self.std = jnp.asarray(std, jnp.float32)
        self.sched = inner.sched
        self.event_shape = inner.event_shape
        self.model = inner.model
        self.params = inner.params

    def _denorm(self, x):
        return x * self.std + self.mean

    def normalize(self, x):
        """Raw VAE latents -> model space (for training-side consumers)."""
        return (x - self.mean) / self.std

    def sample(self, rng, batch, *cond):
        return self._denorm(self._inner.sample(rng, batch, *cond))

    def sample_from(self, rng, x_t, t_start, *cond):
        return self._denorm(self._inner.sample_from(rng, x_t, t_start, *cond))

    def masked_denoise(self, rng, x_init, t_start_vec, *cond):
        return self._denorm(
            self._inner.masked_denoise(rng, x_init, t_start_vec, *cond)
        )

    def sample_with_trajectory(self, rng, batch, *cond):
        final, traj = self._inner.sample_with_trajectory(rng, batch, *cond)
        return self._denorm(final), self._denorm(traj)

    def ddim(self, rng, batch, *cond, num_steps: int = 50):
        return self._denorm(self._inner.ddim(rng, batch, *cond,
                                             num_steps=num_steps))

    def eps(self, x, t, *cond):
        return self._inner.eps(x, t, *cond)

    @property
    def latent_dim(self) -> int:
        return self._inner.latent_dim


class DDIMSampler:
    """View over a sampler that routes `.sample` through the accelerated
    deterministic DDIM path (`.ddim`, Song et al. 2021) at a fixed step
    count — so every downstream consumer (serving, runner sweeps, viz
    grids) can switch sampler by construction, not by call-site edits.
    Trajectory/masked entry points stay ancestral (they exist to visualize
    the ancestral process). Composes inside or outside NormalizedSampler.
    """

    def __init__(self, inner, num_steps: int = 50):
        self._inner = inner
        self.num_steps = int(num_steps)

    def sample(self, rng, batch: int, *cond) -> jax.Array:
        return self._inner.ddim(rng, batch, *cond, num_steps=self.num_steps)

    def __getattr__(self, name):
        return getattr(self._inner, name)


class FusedDiffusionSampler(DiffusionSampler):
    """DiffusionSampler whose `sample` uses the whole-process Pallas kernel
    (latent pipeline only; ~30x the XLA scan at small batches)."""

    def __init__(self, model, params, sched, event_shape, interpret=None,
                 clip_x0: float | None = None,
                 guidance_scale: float | None = None):
        super().__init__(model, params, sched, event_shape, clip_x0=clip_x0,
                         guidance_scale=guidance_scale)
        from flowerdiff.kernels.full_sampler import prepare_fused_sampler

        self._prep = prepare_fused_sampler(model, self.params)
        self._interpret = interpret

    def sample(self, rng, batch: int, *cond) -> jax.Array:
        from flowerdiff.kernels.full_sampler import fused_sample

        color = cond[1] if len(cond) > 1 else None
        return fused_sample(
            self.model, self.params, self.sched, rng, batch, cond[0],
            color=color, prep=self._prep, interpret=self._interpret,
            clip_x0=self.clip_x0, guidance_scale=self.guidance_scale,
        )
