"""Cross-cutting utilities."""
from flowerdiff.utils.image import normalize_latents, psnr, to_uint8
from flowerdiff.utils.quality import (
    classifier_accuracy_on_samples,
    latent_mmd,
    sample_quality_report,
)

__all__ = [
    "normalize_latents",
    "psnr",
    "to_uint8",
    "classifier_accuracy_on_samples",
    "latent_mmd",
    "sample_quality_report",
]
