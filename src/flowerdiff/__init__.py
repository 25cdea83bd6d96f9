"""flowerdiff — TPU-native VAE-GAN + latent-diffusion framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the reference
PyTorch project `ynyeh0221/Oxford-102-Flower-GAN-VAE-latent-diffusion`
(see /root/repo/SURVEY.md for the structural analysis that drives this design):

- class-conditional generative modeling of Oxford 102 Flowers at 64x64,
- a VAE-GAN (residual conv encoder/decoder, channel+spatial attention,
  LayerNorm2d, VGG16 perceptual loss, classifier head, center loss, KL),
- a conditional DDPM trained in the 256-d flat latent space (1000 linear-beta
  steps; class and optionally auto-extracted color conditioning),
- a pixel-space DDPM baseline with a small 2-D UNet,
- the full visualization suite (reconstruction grids, t-SNE/PCA latent plots,
  denoising-path overlays, class sample grids, GIF animations).

Layering (bottom-up): core -> models -> diffusion -> losses -> data -> train
-> viz -> cli, with `parallel` (mesh/sharding) and `kernels` (Pallas) as
cross-cutting TPU tiers. Everything hot runs inside `jax.jit`; reverse
diffusion is one `lax.scan`; multi-chip scaling is GSPMD over a
`jax.sharding.Mesh` (data + model axes).
"""

__version__ = "0.1.0"
