"""Parameter sharding rules.

Megatron-style tensor parallelism for the latent denoiser's wide MLP stages
(hidden dims up to 1024, v1:502): column-parallel first matmuls (output dim on
'model'), row-parallel out-projections (input dim on 'model'). Everything
convolutional (VAE, discriminator, pixel UNet) is small enough to replicate —
DP over 'data' is the scaling story there, matching how XLA best uses ICI for
an all-reduce-dominated workload.

Rules are (regex over the joined param path) -> PartitionSpec; first match
wins; default replicate.
"""
from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flowerdiff.parallel.mesh import MODEL_AXIS

# (path regex, spec for `kernel`-rank-2 leaves, spec for rank-1 bias leaves)
LatentRules = Sequence[Tuple[str, P, P]]


def latent_denoiser_rules() -> LatentRules:
    return [
        # Column-parallel: stage MLP blocks, qkv projections, downsamples.
        (r"(block_fc_\d+|downsample_\d+)/kernel", P(None, MODEL_AXIS), None),
        (r"(block_fc_\d+|downsample_\d+)/bias", None, P(MODEL_AXIS)),
        (r"attn_\d+/qkv/kernel", P(None, MODEL_AXIS), None),
        (r"attn_\d+/qkv/bias", None, P(MODEL_AXIS)),
        # Row-parallel: attention out-projection.
        (r"attn_\d+/out/kernel", P(MODEL_AXIS, None), None),
    ]


def _spec_for(path: str, leaf, rules: LatentRules) -> P:
    for pattern, kernel_spec, bias_spec in rules:
        if re.search(pattern, path):
            spec = kernel_spec if leaf.ndim == 2 else bias_spec
            if spec is not None and len(spec) <= leaf.ndim:
                return spec
    return P()


def shard_params(params, mesh: Mesh, rules: LatentRules = ()):
    """device_put every leaf with its rule's NamedSharding (default:
    replicated). Returns the sharded pytree."""

    def place(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = _spec_for(path_str, leaf, rules) if rules else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
