"""Loss functions (reference's loss zoo, SURVEY.md §2.1).

distances:  euclidean_distance_loss (v1:293-302)
kl:         clamped KL + mu regularizer (v1:380-386)
center:     EMA class-center attraction (v1:362-378) with segment-sum updates
gan:        BCE real/fake + generator adversarial terms (v1:1029, 1097-1105)
"""
from flowerdiff.losses.distances import euclidean_distance_loss
from flowerdiff.losses.kl import kl_divergence
from flowerdiff.losses.center import (
    center_loss,
    standalone_center_loss,
    update_centers,
)
from flowerdiff.losses.gan import bce_loss, discriminator_loss, generator_adv_loss

__all__ = [
    "euclidean_distance_loss",
    "kl_divergence",
    "center_loss",
    "standalone_center_loss",
    "update_centers",
    "bce_loss",
    "discriminator_loss",
    "generator_adv_loss",
]
