"""Learning-rate and loss-gate schedules.

Parity targets:
  - OneCycleLR(max_lr, total_steps, pct_start=0.3, div_factor=25,
    final_div_factor=1000), cosine annealing (v1:1031-1037) — optax's
    cosine_onecycle_schedule implements exactly this shape.
  - CosineAnnealingWarmRestarts(T_0=10, T_mult=2), stepped once per EPOCH
    (v1:1248, 1269) while the optimizer steps per batch — reproduced as a
    pure function of the global step so it is jit-constant-free (no per-epoch
    recompile, no host control flow).
  - The epoch-staged loss gating (v1:1072-1087) and KL-weight ramp (v1:1055),
    computed on host per epoch and passed to the jitted step as a small float
    vector (same values every step of an epoch; never triggers recompilation).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import optax


def onecycle_schedule(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1000.0,
) -> optax.Schedule:
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def cosine_warm_restarts_schedule(
    base_lr: float,
    steps_per_epoch: int,
    t0: int = 10,
    t_mult: int = 2,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """SGDR cosine annealing with warm restarts, epoch-granular (v1:1248).

    With t_mult=2 the restart boundaries are t0*(2^k - 1); inside cycle k the
    period is t0*2^k. Pure jnp math over the step index.
    """

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / float(steps_per_epoch)
        if t_mult == 1:
            t_cur = jnp.mod(epoch, t0)
            t_i = float(t0)
        else:
            # cycle index k = floor(log_{t_mult}(epoch/t0 * (t_mult-1) + 1))
            k = jnp.floor(
                jnp.log(epoch / t0 * (t_mult - 1.0) + 1.0) / math.log(t_mult)
            )
            start = t0 * (jnp.power(float(t_mult), k) - 1.0) / (t_mult - 1.0)
            t_i = t0 * jnp.power(float(t_mult), k)
            t_cur = epoch - start
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * t_cur / t_i)
        )

    return schedule


class LossGates(NamedTuple):
    """Per-epoch scalar gates for the VAE-GAN objective; passed into the
    jitted step as data (float32), identical for every step in an epoch."""

    kl_weight: float
    kl_factor: float
    cls_factor: float
    center_factor: float
    update_centers: float  # 1.0 once epoch >= 60 and center_factor > 0 (v1:1132-1134)


def vae_gan_loss_gates(
    epoch: int,
    num_epochs: int,
    kl_weight_start: float = 0.001,
    kl_weight_end: float = 0.05,
) -> LossGates:
    """Staged loss gating by epoch (v1:1055, 1072-1087):
    <40 recon-only; <80 ramp KL; <160 ramp classifier; >=160 add center loss.
    """
    kl_weight = min(
        kl_weight_end,
        kl_weight_start + (epoch / (num_epochs * 0.6)) * (kl_weight_end - kl_weight_start),
    )
    if epoch < 40:
        kl_f, cls_f, cen_f = 0.0, 0.0, 0.0
    elif epoch < 80:
        kl_f, cls_f, cen_f = min(1.0, (epoch - 20) / 20), 0.0, 0.0
    elif epoch < 160:
        kl_f, cls_f, cen_f = 1.0, min(0.2, (epoch - 40) / 20), 0.0
    else:
        kl_f, cls_f, cen_f = 1.0, 1.0, min(1.0, (epoch - 60) / 20)
    update = 1.0 if (epoch >= 60 and cen_f > 0) else 0.0
    return LossGates(kl_weight, kl_f, cls_f, cen_f, update)
