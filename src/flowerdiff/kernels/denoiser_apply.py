"""Pallas-accelerated inference path for the conditional latent denoiser.

`make_fast_denoiser(model, params)` builds an eps_fn numerically equivalent
(to bf16 precision) to `model.apply(..., deterministic=True)` but with every
stage executed by the fused Pallas kernel (kernels/latent_stage.py). Used by
the sampler, where the denoiser is evaluated 1000x per batch.

The degenerate length-1 attention identity (out_proj(v_proj(x)) — see
models/latent_unet.py) lets the kernel skip the q/k projections and softmax
entirely: only the v-slice of the packed qkv weights is loaded.

Weights are converted to bf16 ONCE up front; inside the sampling scan only
bf16 bytes stream from HBM. Embedding MLPs and per-stage conditioning
projections are tiny (B x 256 inputs) and stay on the XLA path, where they
fuse with the scan's schedule arithmetic.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from flowerdiff.core.embeddings import sinusoidal_time_embedding
from flowerdiff.kernels.latent_stage import fused_head, fused_stage
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _bf16(x):
    return x.astype(jnp.bfloat16)


def _prepare(params: dict, n_stages: int, shared_cond_proj: bool) -> dict:
    """Extract/convert the weight views the kernels need (bf16 matmul
    operands, f32 LN affines), once, outside the scan."""
    p = params
    prep = {
        "latent_proj": (_bf16(p["latent_proj"]["kernel"]),
                        p["latent_proj"]["bias"]),
        "stages": [],
    }
    for i in range(n_stages):
        attn = p[f"attn_{i}"]
        qkv_k, qkv_b = attn["qkv"]["kernel"], attn["qkv"]["bias"]
        d = qkv_k.shape[0]
        stage = {
            "wt": (_bf16(p[f"time_proj_{i}"]["kernel"]),
                   p[f"time_proj_{i}"]["bias"]),
            "wc": None if shared_cond_proj else (
                _bf16(p[f"cond_proj_{i}"]["kernel"]),
                p[f"cond_proj_{i}"]["bias"],
            ),
            "wb": _bf16(p[f"block_fc_{i}"]["kernel"]),
            "bb": p[f"block_fc_{i}"]["bias"],
            "g1": p[f"block_ln_{i}"]["scale"],
            "b1": p[f"block_ln_{i}"]["bias"],
            "g2": p[f"stage_ln_{i}"]["scale"],
            "b2": p[f"stage_ln_{i}"]["bias"],
            # v-slice of the packed qkv projection (degenerate attention).
            "wv": _bf16(qkv_k[:, 2 * d:3 * d]),
            "bv": qkv_b[2 * d:3 * d],
            "wo": _bf16(attn["out"]["kernel"]),
            "bo": attn["out"]["bias"],
            "wd": _bf16(p[f"downsample_{i}"]["kernel"]),
            "bd": p[f"downsample_{i}"]["bias"],
        }
        prep["stages"].append(stage)
    prep["head"] = dict(
        wt=_bf16(p["final_time_proj"]["kernel"]), bt=p["final_time_proj"]["bias"],
        wc=_bf16(p["final_cond_proj"]["kernel"]), bc=p["final_cond_proj"]["bias"],
        g=p["final_norm"]["scale"], b=p["final_norm"]["bias"],
        wf=_bf16(p["final"]["kernel"]), bf=p["final"]["bias"],
    )
    prep["residual_weight"] = p["residual_weight"]
    return prep


def _mlp_embed(sub: dict, x: jax.Array) -> jax.Array:
    h = x @ sub["lin1"]["kernel"] + sub["lin1"]["bias"]
    h = _swish(h)
    return h @ sub["lin2"]["kernel"] + sub["lin2"]["bias"]


def make_fast_denoiser(
    model: ConditionalLatentDenoiser,
    params: dict,
    interpret: Optional[bool] = None,
):
    """Returns eps_fn(x, t, cond[, color]) running stages through Pallas.

    `interpret=None` auto-selects interpreter mode off-TPU (CPU tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = params["params"] if "params" in params else params
    n_stages = len(model.hidden_dims) - 1
    prep = _prepare(p, n_stages, model.shared_cond_proj)
    time_emb_dim = model.time_emb_dim

    def eps_fn(x, t, cond, color=None):
        # Embedding MLPs (tiny) on the XLA path.
        te = sinusoidal_time_embedding(t, time_emb_dim)
        t_base = _mlp_embed(p["time_emb"], te)
        ce = p["cond_emb"]
        if model.num_colors is not None:
            f_emb = ce["flower_embedding"]["embedding"][cond]
            c_emb = ce["color_embedding"]["embedding"][color]
            c_base = (
                jnp.concatenate([f_emb, c_emb], axis=-1) @ ce["proj"]["kernel"]
                + ce["proj"]["bias"]
            )
        else:
            c_base = _mlp_embed(ce, ce["embedding"]["embedding"][cond])

        wk, bk = prep["latent_proj"]
        h = jnp.dot(x.astype(jnp.bfloat16), wk,
                    preferred_element_type=jnp.float32) + bk
        for s in prep["stages"]:
            wt, bt = s["wt"]
            tc = jnp.dot(t_base.astype(jnp.bfloat16), wt,
                         preferred_element_type=jnp.float32) + bt
            if s["wc"] is None:  # v1/v2 shared projection quirk
                tc = tc + jnp.dot(c_base.astype(jnp.bfloat16), wt,
                                  preferred_element_type=jnp.float32) + bt
            else:
                wc, bc = s["wc"]
                tc = tc + jnp.dot(c_base.astype(jnp.bfloat16), wc,
                                  preferred_element_type=jnp.float32) + bc
            h = fused_stage(
                h, tc, s["wb"], s["bb"], s["g1"], s["b1"], s["g2"], s["b2"],
                s["wv"], s["bv"], s["wo"], s["bo"], s["wd"], s["bd"],
                interpret=interpret,
            )
        hd = prep["head"]
        out = fused_head(
            h, t_base, c_base, hd["wt"], hd["bt"], hd["wc"], hd["bc"],
            hd["g"], hd["b"], hd["wf"], hd["bf"], interpret=interpret,
        )
        if model.global_skip:  # v2:561 — reuse the final projection
            skip = jnp.dot(x.astype(jnp.bfloat16), hd["wf"],
                           preferred_element_type=jnp.float32) + hd["bf"]
            out = out + jax.nn.sigmoid(prep["residual_weight"]) * skip
        return out

    return eps_fn
