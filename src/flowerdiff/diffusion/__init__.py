"""Diffusion core (reference layer L4, SURVEY.md §1).

schedule: linear-beta DDPM tables (v1:569-572)
ddpm:     q_sample / p_sample / epsilon-loss (v1:574-607, v4:139-199)
sampler:  jit-compiled lax.scan reverse process + intermediate capture
"""
from flowerdiff.diffusion.schedule import DiffusionSchedule, linear_schedule
from flowerdiff.diffusion.ddpm import q_sample, p_sample_mean, p_sample, ddpm_eps_loss
from flowerdiff.diffusion.sampler import sample, sample_with_trajectory, ddim_sample

__all__ = [
    "DiffusionSchedule",
    "linear_schedule",
    "q_sample",
    "p_sample_mean",
    "p_sample",
    "ddpm_eps_loss",
    "sample",
    "sample_with_trajectory",
    "ddim_sample",
]
