"""Data pipeline (reference layer L1, SURVEY.md §1)."""
from flowerdiff.data.flowers102 import load_flowers102, FLOWERS102_SPLITS
from flowerdiff.data.synthetic import synthetic_flowers
from flowerdiff.data.pipeline import DeviceDataset, make_augment_fn

__all__ = [
    "load_flowers102",
    "FLOWERS102_SPLITS",
    "synthetic_flowers",
    "DeviceDataset",
    "make_augment_fn",
]
