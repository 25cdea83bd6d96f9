"""Pixel-space DDPM training (v4/v5 baseline).

Parity target: train_diffusion (v4/model_train_test.py:239-253; v5:254-276
adds every-10-epoch sample grids/animations): Adam(1e-4), MSE epsilon-loss,
uniform random timesteps.
"""
from __future__ import annotations

import dataclasses

import jax
import optax
import jax.numpy as jnp
from flax.training.train_state import TrainState

from flowerdiff.diffusion import DiffusionSchedule, ddpm_eps_loss, linear_schedule
from flowerdiff.models.pixel_unet import PixelUNet


@dataclasses.dataclass(frozen=True)
class PixelDiffusionConfig:
    lr: float = 1e-4
    n_steps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    img_size: int = 64
    base_channels: int = 64
    time_emb_dim: int = 128
    learnable_residual: bool = False  # True for the v5 preset (v5:54,144)
    compute_dtype: str = "float32"
    # Sampling-time x0-thresholding (ddpm.clip_eps_for_x0). Pixel data lives
    # in [0,1], so 1.0 safely bounds the x0-estimate; None = the reference's
    # unclipped sampler (v4:155-168).
    clip_denoised: float | None = 1.0


def create_pixel_diffusion_state(
    rng: jax.Array, cfg: PixelDiffusionConfig
) -> tuple[TrainState, PixelUNet, DiffusionSchedule]:
    model = PixelUNet(
        base_channels=cfg.base_channels,
        time_emb_dim=cfg.time_emb_dim,
        learnable_residual=cfg.learnable_residual,
        dtype=None if cfg.compute_dtype == "float32" else getattr(jnp, cfg.compute_dtype),
    )
    # One jitted program for init + optimizer-moment zeros (eager flax init
    # dispatches hundreds of tiny programs; see create_vae_gan_state).
    def _build(r):
        dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
        params = model.init(r, dummy, jnp.zeros((1,), jnp.int32))["params"]
        return TrainState.create(
            apply_fn=model.apply, params=params, tx=optax.adam(cfg.lr)
        )

    state = jax.jit(_build)(rng)
    sched = linear_schedule(cfg.n_steps, cfg.beta_start, cfg.beta_end)
    return state, model, sched


def make_pixel_diffusion_step_body(model: PixelUNet, sched: DiffusionSchedule):
    """UN-jitted step (traceable; jitted standalone by
    make_pixel_diffusion_step, or scanned by train/fused.py)."""

    def step(state: TrainState, sched_arg, images, rng):
        # schedule tables as arguments (axon embedded-constant penalty)
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            def eps_fn(xt, t):
                return model.apply({"params": params}, xt, t)

            return ddpm_eps_loss(sched_arg, eps_fn, rng, images, distance="mse")

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return step


def make_pixel_diffusion_step(model: PixelUNet, sched: DiffusionSchedule):
    """Jitted single-batch step (see make_pixel_diffusion_step_body)."""
    return jax.jit(make_pixel_diffusion_step_body(model, sched), donate_argnums=(0,))


class PixelDiffusionTrainer:
    def __init__(self, cfg: PixelDiffusionConfig, rng: jax.Array):
        self.cfg = cfg
        self.state, self.model, self.sched = create_pixel_diffusion_state(rng, cfg)
        self._step = make_pixel_diffusion_step(self.model, self.sched)
        self._fused = {}  # (T, B, augment) -> jitted multi-epoch fn

    def run_epoch(self, batches, rng: jax.Array) -> float:
        total, count = None, 0
        for i, (images, _labels) in enumerate(batches):
            self.state, loss = self._step(
                self.state, self.sched, images, jax.random.fold_in(rng, i)
            )
            total = loss if total is None else total + loss
            count += 1
        return float(total) / count

    def run_epochs_fused(self, dataset, epochs: int, rng: jax.Array,
                         batch_size: int = 64, mesh=None):
        """Train `epochs` epochs in ONE device dispatch (train/fused.py).
        Returns per-epoch mean losses (one host fetch for the chunk)."""
        import numpy as np

        from flowerdiff.train.fused import epoch_rows, make_fused_pixel_epochs

        host_seed = int(jax.random.randint(
            jax.random.fold_in(rng, 1), (), 0, 2**31 - 1
        ))
        idx, offsets, steps = epoch_rows(host_seed, dataset.n, batch_size, epochs)
        key = (idx.shape[0], idx.shape[1], steps, dataset.augment_enabled,
               mesh is not None)
        if key not in self._fused:
            self._fused[key] = make_fused_pixel_epochs(
                self.model, self.cfg, augment=dataset.augment_enabled,
                max_rotation_deg=dataset.max_rotation_deg,
                jitter=dataset.jitter, mesh=mesh, steps_per_epoch=steps,
            )
        step_rng, data_key = jax.random.split(jax.random.fold_in(rng, 2))
        self.state, losses = self._fused[key](
            self.state, self.sched, dataset.images, idx, offsets,
            step_rng, data_key,
        )
        losses = np.asarray(jax.device_get(losses)).reshape(epochs, steps)
        return losses.mean(axis=1).tolist()

    def sampler(self):
        from flowerdiff.diffusion.api import DiffusionSampler

        return DiffusionSampler(
            self.model, {"params": self.state.params}, self.sched,
            (self.cfg.img_size, self.cfg.img_size, 3),
            clip_x0=self.cfg.clip_denoised,
        )

    def eps_fn(self, params=None):
        params = self.state.params if params is None else params

        def fn(xt, t):
            return self.model.apply({"params": params}, xt, t)

        return fn
