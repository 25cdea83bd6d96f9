"""Pallas TPU kernels (the framework's native tier, SURVEY.md §2.3).

The reference has no native code; its compiled tier was cuDNN/cuBLAS via
torch. Ours is XLA for everything plus hand-written Pallas kernels for the
one true hot path: the conditional latent denoiser evaluated 1000x per
sampled batch (SURVEY.md §3.3).

- `full_sampler.fused_sample`: the FLAGSHIP kernel — the entire 1000-step
  reverse process in ONE kernel / one dispatch, all inference weights
  VMEM-resident, on-core Box-Muller PRNG. Used by FusedDiffusionSampler,
  SamplingService and bench.py.
- `latent_stage.fused_stage/head` + `denoiser_apply.make_fast_denoiser`:
  per-stage fused kernels (one kernel per denoiser stage), kept as the
  building-block variant and for ablation benchmarks.
"""
from flowerdiff.kernels.latent_stage import fused_stage, fused_head
from flowerdiff.kernels.denoiser_apply import make_fast_denoiser
from flowerdiff.kernels.full_sampler import fused_sample, prepare_fused_sampler

__all__ = [
    "fused_stage",
    "fused_head",
    "make_fast_denoiser",
    "fused_sample",
    "prepare_fused_sampler",
]
