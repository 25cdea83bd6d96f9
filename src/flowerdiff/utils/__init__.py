"""Cross-cutting utilities."""
from flowerdiff.utils.image import psnr, to_uint8

__all__ = ["psnr", "to_uint8"]
