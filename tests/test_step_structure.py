"""Structural pin on the VAE-GAN train step's traced program.

Round 3 removed a duplicated generator forward from the step: the reference
computes recon exactly once (v1:1069) and reuses it detached for the D
update (v1:1098) and live for the adv term (v1:1105), but the round-2 step
traced the G forward twice (grad-stopped + differentiated) and XLA did NOT
CSE across the two differentiation contexts — a measured 16-18% of step
time. This test pins the single-forward structure by counting convolution
ops in the lowered (pre-XLA-optimization) program: reintroducing a second
G forward adds one full forward's worth of convolutions (+27 at the tiny
width used here), far above the assertion margin.
"""

import jax
import jax.numpy as jnp

from flowerdiff.models.discriminator import Discriminator64
from flowerdiff.models.vae import FlowerVAE
from flowerdiff.train.schedules import vae_gan_loss_gates
from flowerdiff.train.vae_gan import (
    VAEGANConfig,
    create_vae_gan_state,
    gates_array,
    make_vae_gan_step_body,
)

TINY_VAE = dict(channels=(8, 16, 24, 32), head_width=32)


def _conv_count(lowered_text):
    return lowered_text.count("stablehlo.convolution")


def test_vae_gan_step_traces_single_generator_forward():
    cfg = VAEGANConfig(
        num_classes=7, latent_dim=16, total_steps=10, use_perceptual=False
    )
    vae = FlowerVAE(latent_dim=16, num_classes=7, **TINY_VAE)
    disc = Discriminator64()
    state, vae, disc = create_vae_gan_state(
        jax.random.key(0), cfg, vae=vae, disc=disc
    )
    body = make_vae_gan_step_body(vae, disc, cfg, None)

    imgs = jnp.zeros((4, 64, 64, 3))
    labels = jnp.zeros((4,), jnp.int32)
    gates = gates_array(vae_gan_loss_gates(200, 1200))
    step_text = (
        jax.jit(body)
        .lower(state, imgs, labels, gates, jax.random.key(1), None)
        .as_text()
    )
    step_convs = _conv_count(step_text)

    def g_forward(p, x, k):
        return vae.apply(
            {"params": p}, x, k, False, rngs={"dropout": jax.random.key(2)}
        )

    fwd_text = (
        jax.jit(g_forward)
        .lower(state.gen.params, imgs, jax.random.key(3))
        .as_text()
    )
    fwd_convs = _conv_count(fwd_text)

    # Pinned at 118 when written (27-conv G forward); small margin for
    # harmless lowering drift. A duplicated G forward lands at ~step+fwd.
    assert fwd_convs > 20, "tiny G forward unexpectedly small — update pin"
    assert step_convs <= 118 + 4, (
        f"step traces {step_convs} convolutions (pinned 118, margin 4); "
        f"a duplicated generator forward would add ~{fwd_convs} — "
        "see train/vae_gan.py's jax.vjp single-forward structure"
    )
