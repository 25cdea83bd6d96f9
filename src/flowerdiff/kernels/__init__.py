"""Pallas TPU kernels (the framework's native tier, SURVEY.md §2.3).

The reference has no native code; its compiled tier was cuDNN/cuBLAS via
torch. Ours is XLA for everything plus hand-written Pallas kernels for the
one true hot path: the conditional latent denoiser evaluated 1000x per
sampled batch (SURVEY.md §3.3). `fused_stage` executes a full denoiser stage
(conditioning add -> residual MLP block -> LayerNorm -> degenerate length-1
attention -> down-projection) as ONE kernel with bf16 weights resident in
VMEM and float32 accumulation on the MXU.
"""
from flowerdiff.kernels.latent_stage import fused_stage, fused_head
from flowerdiff.kernels.denoiser_apply import make_fast_denoiser

__all__ = ["fused_stage", "fused_head", "make_fast_denoiser"]
