"""Cross-cutting utilities."""
from flowerdiff.utils.image import normalize_latents, psnr, to_uint8

__all__ = ["normalize_latents", "psnr", "to_uint8"]
