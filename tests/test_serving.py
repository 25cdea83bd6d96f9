"""SamplingService tests (serving.py): XLA path on CPU; the fused path is
covered by kernel tests + the TPU bench."""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.models import ConditionalLatentDenoiser, FlowerVAE
from flowerdiff.serving import SamplingService
from flowerdiff.diffusion import linear_schedule


def test_sampling_service_end_to_end():
    model = ConditionalLatentDenoiser(
        latent_dim=16, hidden_dims=(16, 32, 16), time_emb_dim=16, num_classes=6
    )
    vae = FlowerVAE(latent_dim=16, num_classes=6,
                    channels=(8, 16, 24, 32), head_width=32)
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    vae_params = vae.init({"params": rng}, jnp.zeros((1, 64, 64, 3)), rng,
                          method=FlowerVAE.init_all)

    service = SamplingService(model, params, vae, vae_params,
                              sched=linear_schedule(8), use_fused=False)
    images = service.sample_classes([0, 3], n_per_class=2, rng=jax.random.key(1))
    assert images.shape == (4, 64, 64, 3)
    assert float(images.min()) >= 0.0 and float(images.max()) <= 1.0

    latents = service.sample_latents(jnp.array([1, 2]), jax.random.key(2))
    assert latents.shape == (2, 16) and bool(jnp.isfinite(latents).all())
