"""VAE-GAN training: one jitted step, two optimizers.

Parity target: train_autoencoder (v1/model_train_test.py:1014-1193). The
reference runs, per batch: G forward; D backward on (real, recon.detach());
D optimizer step; G adversarial loss against the UPDATED discriminator; G
backward on the weighted sum of euclidean-recon + VGG-perceptual + KL +
cross-entropy + center + adversarial losses with host-float adaptive scales
(v1:1107-1115); grad-clip 1.0; OneCycleLR step; EMA center update (epoch>=60).

TPU-first redesign (SURVEY.md §7.1):
  - The WHOLE sequence above is ONE jitted function: D grads use
    stop_gradient on the reconstruction (the `.detach()`), the D params are
    functionally updated, and the G loss then uses the new D params — same
    ordering as the reference with zero host synchronization per step.
  - The adaptive per-term scales are computed on device from
    `lax.stop_gradient` ratios (v1:1107-1115 semantics, no `.item()` syncs).
  - Epoch-staged gates arrive as a small float vector (train/schedules.py) —
    data, not Python constants, so epochs never recompile.
  - The EMA center update (v1:1132-1134) is a masked segment-sum update on
    the same device pass.
  - The generator forward runs ONCE: the G objective is restructured around
    an explicit jax.vjp so the D-loss (on the detached recon) and the G-loss
    (vs the updated D) share a single forward's primals/residuals (see
    make_vae_gan_step_body). XLA does NOT CSE duplicate forwards across
    differentiation contexts — the vjp restructure bought +16-18% step time.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training.train_state import TrainState

from flowerdiff.losses import (
    center_loss,
    discriminator_loss,
    euclidean_distance_loss,
    generator_adv_loss,
    kl_divergence,
    update_centers,
)
from flowerdiff.models.vae import FlowerVAE
from flowerdiff.models.discriminator import Discriminator64
from flowerdiff.models.vgg import VGGPerceptual
from flowerdiff.train.schedules import LossGates, onecycle_schedule


@dataclasses.dataclass(frozen=True)
class VAEGANConfig:
    """Hyperparameters (reference defaults: v1:1014-1017, 1026-1037, 1315-1324)."""

    lr: float = 1e-4
    weight_decay: float = 1e-5
    d_lr: float = 1e-4
    d_betas: tuple = (0.5, 0.999)
    lambda_recon: float = 1.0
    lambda_cls: float = 0.3
    lambda_center: float = 0.1
    lambda_vgg: float = 0.4
    lambda_gan: float = 0.2
    kl_weight_start: float = 0.001
    kl_weight_end: float = 0.05
    grad_clip: float = 1.0
    total_steps: int = 10_000  # OneCycle horizon = num_epochs * steps_per_epoch
    use_perceptual: bool = True
    num_classes: int = 102
    latent_dim: int = 256
    channels: tuple = (64, 128, 256, 512)  # encoder/decoder widths (v1:185-208)
    head_width: int = 512
    compute_dtype: str = "float32"  # "bfloat16" for mixed-precision training
    # Rematerialize encoder/decoder residual blocks in the backward pass —
    # an HBM-traffic lever for the bandwidth-bound G+D step (models/vae.py
    # Encoder.remat; measured in tools/mfu.py).
    remat: bool = False


class VAEGANState(struct.PyTreeNode):
    gen: TrainState
    disc: TrainState
    centers: jax.Array  # (num_classes, latent_dim) EMA buffers (v1:322-323)

    @property
    def step(self):
        return self.gen.step


def create_vae_gan_state(
    rng: jax.Array,
    cfg: VAEGANConfig,
    vae: Optional[FlowerVAE] = None,
    disc: Optional[Discriminator64] = None,
    img_size: int = 64,
) -> tuple[VAEGANState, FlowerVAE, Discriminator64]:
    import jax.numpy as _jnp

    dtype = None if cfg.compute_dtype == "float32" else getattr(_jnp, cfg.compute_dtype)
    vae = vae or FlowerVAE(
        latent_dim=cfg.latent_dim, num_classes=cfg.num_classes,
        channels=tuple(cfg.channels), head_width=cfg.head_width, dtype=dtype,
        remat=cfg.remat,
    )
    disc = disc or Discriminator64(dtype=dtype)
    g_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            onecycle_schedule(cfg.lr, cfg.total_steps),
            b1=0.9,
            b2=0.999,
            weight_decay=cfg.weight_decay,
        ),
    )
    d_tx = optax.adam(cfg.d_lr, b1=cfg.d_betas[0], b2=cfg.d_betas[1])

    # The WHOLE state build (model inits + optimizer-moment zeros) runs as
    # one jitted program: eagerly, flax init dispatches hundreds of tiny
    # single-op programs, each a ~0.35 s server-side compile on the
    # tunneled runtime — a measured ~90 s client-side plus a ~400 s deferred
    # backlog that stalled the next real host fetch. Jitted: ~9 s total.
    def _build(r):
        g_key, d_key, z_key = jax.random.split(r, 3)
        dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        g_params = vae.init(
            {"params": g_key}, dummy, z_key, method=FlowerVAE.init_all
        )["params"]
        d_params = disc.init(d_key, dummy)["params"]
        return VAEGANState(
            gen=TrainState.create(apply_fn=vae.apply, params=g_params, tx=g_tx),
            disc=TrainState.create(apply_fn=disc.apply, params=d_params, tx=d_tx),
            centers=jnp.zeros((cfg.num_classes, cfg.latent_dim), jnp.float32),
        )

    return jax.jit(_build)(rng), vae, disc


def make_vae_gan_step_body(
    vae: FlowerVAE,
    disc: Discriminator64,
    cfg: VAEGANConfig,
    vgg: Optional[VGGPerceptual] = None,
):
    """Build the UN-jitted train step (traceable; used standalone under jit by
    make_vae_gan_step, or inside a lax.scan by train/fused.py).

    step(state, images, labels, gates, rng, vgg_params) -> (new_state, metrics)
      gates: LossGates as a float32 vector of length 5.
      vgg_params: frozen perceptual-backbone params passed as a jit ARGUMENT
        (closing over them would bake them in as XLA constants).
    """
    use_vgg = cfg.use_perceptual and vgg is not None
    if use_vgg:
        from flowerdiff.models.vgg import IMAGENET_MEAN, IMAGENET_STD, VGGFeatures

        # The frozen perceptual backbone follows the step's compute dtype:
        # in bf16 it is ~1/3 of the step FLOPs that would otherwise run f32.
        vgg_dtype = (None if cfg.compute_dtype == "float32"
                     else getattr(jnp, cfg.compute_dtype))
        vgg_model = VGGFeatures(dtype=vgg_dtype)

        def perceptual_loss(vgg_params, x, y):
            mean = jnp.asarray(IMAGENET_MEAN)
            std = jnp.asarray(IMAGENET_STD)
            fx = vgg_model.apply(vgg_params, (x - mean) / std)
            fy = vgg_model.apply(vgg_params, (y - mean) / std)
            return euclidean_distance_loss(fx, fy)

    def forward(g_params, images, reparam_rng, dropout_rng):
        recon, mu, logvar, z = vae.apply(
            {"params": g_params}, images, reparam_rng, False,
            rngs={"dropout": dropout_rng},
        )
        return recon, mu, logvar, z

    def step(state: VAEGANState, images, labels, gates, rng, vgg_params):
        kl_weight, kl_factor, cls_factor, center_factor, do_update_centers = (
            gates[0], gates[1], gates[2], gates[3], gates[4],
        )
        reparam_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        # ---- SINGLE generator forward, residuals captured for the backward.
        # The reference computes recon exactly once (v1:1069); the D step uses
        # recon.detach() (v1:1098) and the G adv term reuses the same tensor
        # against the updated D (v1:1105). jax.vjp mirrors that: one encoder+
        # decoder forward feeds both the D update (grad-stopped) and the G
        # backward, instead of tracing the G forward twice. ----
        (recon, mu, logvar, z), g_vjp = jax.vjp(
            lambda p: forward(p, images, reparam_rng, dropout_rng),
            state.gen.params,
        )
        recon_sg = jax.lax.stop_gradient(recon)

        # ---- Discriminator update (v1:1097-1102): recon is detached. ----
        def d_loss_fn(d_params):
            real_logits = disc.apply({"params": d_params}, images)
            fake_logits = disc.apply({"params": d_params}, recon_sg)
            return discriminator_loss(real_logits, fake_logits)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc.params)
        new_disc = state.disc.apply_gradients(grads=d_grads)

        # ---- Generator update against the UPDATED discriminator (v1:1105).
        # The head loss is differentiated w.r.t. BOTH the forward outputs
        # (pulled back through g_vjp into encoder/decoder params) and g_params
        # directly (the classifier head consumes z with its own params). ----
        def g_loss_fn(outs, g_params):
            recon, mu, logvar, z = outs
            recon_loss = euclidean_distance_loss(recon, images)
            if use_vgg:
                perceptual = perceptual_loss(vgg_params, recon, images)
            else:
                perceptual = jnp.float32(0.0)
            kl = kl_divergence(mu, logvar)
            logits = vae.apply(
                {"params": g_params}, z, False,
                method=FlowerVAE.classify, rngs={"dropout": dropout_rng},
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
            center = center_loss(z, labels, state.centers)
            fake_logits = disc.apply({"params": new_disc.params}, recon)
            adv = generator_adv_loss(fake_logits)

            # Adaptive scales (v1:1107-1115) on device, grad-stopped.
            r = jax.lax.stop_gradient(recon_loss)
            p = jax.lax.stop_gradient(perceptual)
            k = jax.lax.stop_gradient(kl)
            a = jax.lax.stop_gradient(adv)
            big = r > 1e-8
            perceptual_scale = jnp.where(big, jnp.minimum(1.0, r / (p + 1e-8)), 1.0)
            kl_scale = jnp.where(big & (k > 0), jnp.minimum(1.0, r / (k + 1e-8)), 1.0)
            gan_scale = jnp.where(big, jnp.minimum(1.0, r / (a + 1e-8)), 1.0)

            total = (
                cfg.lambda_recon * recon_loss
                + cfg.lambda_vgg * perceptual_scale * perceptual
                + kl_weight * kl_scale * kl_factor * kl
                + cfg.lambda_cls * cls_factor * ce
                + cfg.lambda_center * center_factor * center
                + cfg.lambda_gan * gan_scale * adv
            )
            aux = {
                "recon": recon_loss,
                "perceptual": perceptual,
                "kl": kl,
                "class": ce,
                "center": center,
                "gan": adv,
                "d_loss": d_loss,
                "total": total,
                "z": z,
            }
            return total, aux

        (_, aux), (outs_ct, head_grads) = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1), has_aux=True
        )((recon, mu, logvar, z), state.gen.params)
        (body_grads,) = g_vjp(outs_ct)
        g_grads = jax.tree.map(jnp.add, body_grads, head_grads)
        new_gen = state.gen.apply_gradients(grads=g_grads)

        # ---- EMA center update (v1:1132-1134), gated by the epoch flag. ----
        z_detached = jax.lax.stop_gradient(aux.pop("z"))
        updated = update_centers(state.centers, z_detached, labels, momentum=0.9)
        centers = jnp.where(do_update_centers > 0, updated, state.centers)

        new_state = VAEGANState(gen=new_gen, disc=new_disc, centers=centers)
        return new_state, aux

    return step


def make_vae_gan_step(
    vae: FlowerVAE,
    disc: Discriminator64,
    cfg: VAEGANConfig,
    vgg: Optional[VGGPerceptual] = None,
):
    """Jitted single-batch train step (see make_vae_gan_step_body)."""
    return jax.jit(make_vae_gan_step_body(vae, disc, cfg, vgg), donate_argnums=(0,))


def gates_array(g: LossGates) -> jnp.ndarray:
    return jnp.asarray(g, jnp.float32)


class VAEGANTrainer:
    """Host-side orchestration: epochs, gates, metric accumulation, and the
    train-if-missing / best-checkpoint policy (v1:1177-1191).

    Metrics are accumulated on device and fetched ONCE per epoch (the
    reference `.item()`s seven floats per step, v1:1137-1143).
    """

    def __init__(self, cfg: VAEGANConfig, rng: jax.Array,
                 vgg: Optional[VGGPerceptual] = None, img_size: int = 64):
        self.cfg = cfg
        self.state, self.vae, self.disc = create_vae_gan_state(rng, cfg, img_size=img_size)
        if cfg.use_perceptual and vgg is None:
            vgg = VGGPerceptual()
        self.vgg = vgg
        self.vgg_params = vgg.params if (cfg.use_perceptual and vgg) else None
        self.step_fn = make_vae_gan_step(self.vae, self.disc, cfg, vgg)
        self._fused = {}  # (T, B, augment) -> jitted multi-epoch fn

    def run_epoch(self, batches, epoch: int, num_epochs: int, rng: jax.Array):
        """batches: iterable of (images, labels) device arrays. Returns the
        epoch-mean metrics dict (host floats, one fetch)."""
        from flowerdiff.train.schedules import vae_gan_loss_gates

        gates = gates_array(
            vae_gan_loss_gates(
                epoch, num_epochs, self.cfg.kl_weight_start, self.cfg.kl_weight_end
            )
        )
        totals: Optional[dict] = None
        count = 0
        for i, (images, labels) in enumerate(batches):
            self.state, metrics = self.step_fn(
                self.state, images, labels, gates, jax.random.fold_in(rng, i),
                self.vgg_params,
            )
            totals = metrics if totals is None else jax.tree.map(
                jnp.add, totals, metrics
            )
            count += 1
        means = jax.tree.map(lambda a: a / count, totals)
        return {k: float(v) for k, v in jax.device_get(means).items()}

    def run_epochs_fused(self, dataset, start_epoch: int, num_epochs_total: int,
                         epochs: int, rng: jax.Array, batch_size: int = 64,
                         mesh=None, best=None):
        """Train `epochs` consecutive epochs (starting at absolute epoch
        `start_epoch` for gate staging) in ONE device dispatch
        (train/fused.py). `dataset` is a data.DeviceDataset. Returns the
        per-epoch mean metrics dicts (one host fetch for the whole chunk).

        best: optional (best_loss: float, best_state: VAEGANState) carry for
        the reference's per-epoch best-checkpoint policy (v1:1177-1182),
        tracked INSIDE the dispatch at epoch granularity. When given, returns
        (metrics, (best_loss, best_epoch_absolute | None, best_state)); the
        passed best_state buffer is donated."""
        import numpy as np

        from flowerdiff.train.fused import epoch_rows, make_fused_vae_gan_epochs
        from flowerdiff.train.schedules import vae_gan_loss_gates

        host_seed = int(jax.random.randint(
            jax.random.fold_in(rng, 1), (), 0, 2**31 - 1
        ))
        idx, offsets, steps = epoch_rows(
            host_seed, dataset.n, batch_size, epochs
        )
        gates = np.stack([
            np.asarray(gates_array(vae_gan_loss_gates(
                start_epoch + e, num_epochs_total,
                self.cfg.kl_weight_start, self.cfg.kl_weight_end,
            )))
            for e in range(epochs)
        ])  # (E, 5)
        gates = jnp.asarray(np.repeat(gates, steps, axis=0))  # (T, 5)

        track_best = best is not None
        key = (idx.shape[0], idx.shape[1], steps, dataset.augment_enabled,
               mesh is not None, track_best)
        if key not in self._fused:
            self._fused[key] = make_fused_vae_gan_epochs(
                self.vae, self.disc, self.cfg, self.vgg,
                augment=dataset.augment_enabled,
                max_rotation_deg=dataset.max_rotation_deg,
                jitter=dataset.jitter, mesh=mesh, steps_per_epoch=steps,
                track_best=track_best,
            )
        step_rng, data_key = jax.random.split(jax.random.fold_in(rng, 2))
        args = (self.state, dataset.images, dataset.labels, idx, offsets,
                gates, step_rng, data_key, self.vgg_params)
        if track_best:
            best_loss, best_state = best
            self.state, metrics, bl, bi, best_state = self._fused[key](
                *args, jnp.float32(best_loss), best_state,
            )
            bi = int(bi)
            best_out = (
                float(bl),
                start_epoch + bi if bi >= 0 else None,
                best_state,
            )
        else:
            self.state, metrics = self._fused[key](*args)
        metrics = jax.device_get(metrics)  # dict of (T,)
        out = []
        for e in range(epochs):
            sl = slice(e * steps, (e + 1) * steps)
            out.append({k: float(np.mean(v[sl])) for k, v in metrics.items()})
        return (out, best_out) if track_best else out
