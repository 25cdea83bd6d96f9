"""Core NN building blocks (reference layer L2, SURVEY.md §1).

NHWC layout throughout (TPU-native; XLA convs tile best on NHWC).
"""
from flowerdiff.core.layers import (
    swish,
    kaiming_init,
    LayerNorm2d,
    CALayer,
    SpatialAttention,
    ResidualBlock,
    ConditionedResidualBlock,
)
from flowerdiff.core.embeddings import (
    sinusoidal_time_embedding,
    TimeEmbedding,
    ClassEmbedding,
    MultiConditionEmbedding,
)
from flowerdiff.core.attention import MultiHeadSelfAttention, SpatialSelfAttention2D

__all__ = [
    "swish",
    "kaiming_init",
    "LayerNorm2d",
    "CALayer",
    "SpatialAttention",
    "ResidualBlock",
    "ConditionedResidualBlock",
    "SpatialSelfAttention2D",
    "sinusoidal_time_embedding",
    "TimeEmbedding",
    "ClassEmbedding",
    "MultiConditionEmbedding",
    "MultiHeadSelfAttention",
]
