"""Models (reference layer L3, SURVEY.md §1)."""
from flowerdiff.models.vae import Encoder, Decoder, FlowerVAE
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser
from flowerdiff.models.discriminator import Discriminator64
from flowerdiff.models.pixel_unet import PixelUNet
from flowerdiff.models.vgg import VGGFeatures, VGGPerceptual

__all__ = [
    "Encoder",
    "Decoder",
    "FlowerVAE",
    "ConditionalLatentDenoiser",
    "Discriminator64",
    "PixelUNet",
    "VGGFeatures",
    "VGGPerceptual",
]
