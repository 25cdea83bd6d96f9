"""Device-mesh parallelism (SURVEY.md §5.8).

The reference is single-device (SURVEY.md §2.3: no DP/TP/PP anywhere).
TPU-native scaling here is GSPMD: a `jax.sharding.Mesh` with ('data', 'model')
axes, batch sharded over 'data' (pure DP over ICI) and the latent denoiser's
wide stage matmuls Megatron-sharded over 'model' (TP), with jit inserting the
all-reduces. No NCCL/MPI translation — collectives are XLA's.
"""
from flowerdiff.parallel.mesh import create_mesh, data_sharding, replicated
from flowerdiff.parallel.sharding import shard_params, latent_denoiser_rules

__all__ = [
    "create_mesh",
    "data_sharding",
    "replicated",
    "shard_params",
    "latent_denoiser_rules",
]
