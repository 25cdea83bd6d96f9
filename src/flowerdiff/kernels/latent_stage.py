"""Fused latent-denoiser stage kernels.

One denoiser stage (flowerdiff.models.latent_unet, mirroring v1:540-553) is,
at inference with a length-1 attention sequence (softmax over one key == 1,
so attention == out_proj(v_proj(x))):

    h  = h + tc                         # time+class conditioning add
    u  = swish(LN1(h @ Wb + bb))        # residual MLP block
    h  = h + u
    hn = LN2(h)
    h  = h + (hn @ Wv + bv) @ Wo + bo   # degenerate MHA
    out = h @ Wd + bd                   # down/up projection

XLA runs this as ~5 separate dot kernels with HBM round-trips for each
(B, d) intermediate. The Pallas kernel executes the whole chain with every
intermediate held in VMEM: four MXU matmuls back-to-back, elementwise and
LayerNorm work on the VPU between them, one HBM read per weight and one HBM
write for the output. Weights are passed in bf16 (half the HBM streaming
cost — the dominant term when the stage is called 1000x in a sampling scan);
accumulation is float32 via preferred_element_type.

VMEM budget at the widest stage (d=1024, d_out=512, B<=512):
bf16 weights 2+2+2+1 MB + f32 activations ~2 MB + LN scratch << 16 MB/core.

Shapes follow the tiling rules from the TPU guide: all matmul operand dims
here are multiples of (8, 128) for the reference widths (256/512/1024); the
batch dim is padded to a multiple of 8 by the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layernorm(x, gamma, beta, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def _stage_kernel(
    h_ref, tc_ref,
    wb_ref, bb_ref, g1_ref, b1_ref,
    g2_ref, b2_ref,
    wv_ref, bv_ref, wo_ref, bo_ref,
    wd_ref, bd_ref,
    out_ref,
):
    h = h_ref[:] + tc_ref[:]

    u = jnp.dot(h.astype(jnp.bfloat16), wb_ref[:],
                preferred_element_type=jnp.float32) + bb_ref[:]
    u = _layernorm(u, g1_ref[:], b1_ref[:])
    u = u * jax.nn.sigmoid(u)  # swish
    h = h + u

    hn = _layernorm(h, g2_ref[:], b2_ref[:])
    v = jnp.dot(hn.astype(jnp.bfloat16), wv_ref[:],
                preferred_element_type=jnp.float32) + bv_ref[:]
    o = jnp.dot(v.astype(jnp.bfloat16), wo_ref[:],
                preferred_element_type=jnp.float32) + bo_ref[:]
    h = h + o

    out_ref[:] = jnp.dot(h.astype(jnp.bfloat16), wd_ref[:],
                         preferred_element_type=jnp.float32) + bd_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stage(
    h: jax.Array,   # (B, d) float32
    tc: jax.Array,  # (B, d) float32 — summed time+class projection
    wb, bb, g1, b1,  # block Dense (d,d) bf16 + f32 LN affine
    g2, b2,          # stage LN affine
    wv, bv, wo, bo,  # attention v/out projections (d,d) bf16
    wd, bd,          # down projection (d, d_out) bf16
    interpret: bool = False,
) -> jax.Array:
    batch, d = h.shape
    d_out = wd.shape[1]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _stage_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, d_out), jnp.float32),
        in_specs=[vspec] * 14,
        out_specs=vspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * d * (3 * d + d_out),
            bytes_accessed=(3 * d * d + d * d_out) * 2 + batch * (d + d_out) * 4,
            transcendentals=batch * d,
        ),
    )(h, tc, wb, bb, g1, b1, g2, b2, wv, bv, wo, bo, wd, bd)


def _head_kernel(
    h_ref, t_ref, c_ref,
    wt_ref, bt_ref, wc_ref, bc_ref,
    g_ref, b_ref, wf_ref, bf_ref,
    out_ref,
):
    tp = jnp.dot(t_ref[:].astype(jnp.bfloat16), wt_ref[:],
                 preferred_element_type=jnp.float32) + bt_ref[:]
    cp = jnp.dot(c_ref[:].astype(jnp.bfloat16), wc_ref[:],
                 preferred_element_type=jnp.float32) + bc_ref[:]
    h = h_ref[:] + tp + cp
    h = _layernorm(h, g_ref[:], b_ref[:])
    out_ref[:] = jnp.dot(h.astype(jnp.bfloat16), wf_ref[:],
                         preferred_element_type=jnp.float32) + bf_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_head(
    h: jax.Array,       # (B, d_last)
    t_base: jax.Array,  # (B, d_emb)
    c_base: jax.Array,  # (B, d_emb)
    wt, bt, wc, bc,     # final time/cond projections (d_emb, d_last) bf16
    g, b,               # final LN affine
    wf, bf,             # final Dense (d_last, latent) bf16
    interpret: bool = False,
) -> jax.Array:
    batch = h.shape[0]
    latent = wf.shape[1]
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _head_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, latent), jnp.float32),
        in_specs=[vspec] * 11,
        out_specs=vspec,
        interpret=interpret,
    )(h, t_base, c_base, wt, bt, wc, bc, g, b, wf, bf)
