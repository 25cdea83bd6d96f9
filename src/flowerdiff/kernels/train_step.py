"""Fused forward+backward Pallas kernel for the latent-DDPM train step.

Motivation (measured, artifacts/decompose_latent_r4.json): the denoiser
fwd+bwd at the reference batch (b64) is only ~4.6 GFLOP yet takes ~3.8 ms as
a standalone XLA program and ~1-2 ms inside the fused epoch scan — the MLP
hourglass (models/latent_unet.py) issues ~300 small ops whose per-op
overhead dwarfs their math, the same failure mode kernels/full_sampler.py
removed from the sampling path. This kernel runs the ENTIRE training
objective — q_sample, time/class embeddings, all hourglass stages with
dropout, the euclidean epsilon-loss, and the full backward pass — as ONE
Pallas program with every weight and activation VMEM-resident.

Design:
  - The forward is written ONCE as a plain-jnp function over a weight pytree
    (`forward_loss`); the kernel calls `jax.vjp` on it IN-KERNEL, so the
    backward is derived by JAX's AD and lowered by Mosaic together with the
    forward — no hand-derived gradients to drift out of parity. The same
    function under `jax.grad` outside the kernel is the test oracle
    (tests/test_train_kernel.py).
  - All randomness (timesteps, noise, dropout masks, CFG condition mask) is
    drawn OUTSIDE with jax.random and passed in: t/eps reuse ddpm_eps_loss's
    exact key derivation so the kernel path matches the XLA step bitwise on
    everything except dropout masks (flax Dropout's internal fold-in is not
    reproduced; the kernel draws i.i.d. Bernoulli masks from the same
    drop_rng — statistically identical, documented like the fused sampler's
    PRNG stream, SURVEY.md §7.3(5)). With dropout_rate=0 the kernel step
    must match the XLA step numerically (tested).
  - Length-1 attention (v1:550-552): softmax over one key is identically 1,
    so only the v/out projections carry compute; the attention-weight
    dropout becomes a per-(sample, head) mask on v. q/k projections get
    exactly ZERO gradient (d softmax(single logit) = 0) — the grad tree
    rebuilds the packed qkv kernel with zero q/k blocks, matching XLA.
  - Matmul operands are cast to `dtype` (bf16 default, f32 for the exact
    test lane) with f32 accumulation; LayerNorms, swish, loss and all
    gradients stay f32.
  - The optimizer stays in XLA (optax AdamW via state.apply_gradients) —
    grad clip/LR schedule/EMA semantics identical to the plain step.

Parity targets: the training loop the reference runs 10,000 epochs of
(v1/model_train_test.py:1241-1264); the denoiser forward is
models/latent_unet.py (v1:501-561).

Scope: shared_cond_proj (v1/v2) with optional global_skip (v2:561),
single-condition (num_colors=None). The v3 dual-condition variant falls
back to the XLA step body.
"""
from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowerdiff.models.latent_unet import ConditionalLatentDenoiser

_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def _ln(x, gamma, beta):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _LN_EPS) * gamma + beta


def _swish(x):
    return x * jax.nn.sigmoid(x)


def forward_loss(weights, data, *, n_stages, dtype, global_skip):
    """Plain-jnp training objective on a weight pytree.

    weights: dict — see prepare_train_weights for the layout (biases and LN
    affines as (1, d) f32 rows; matmul kernels f32, cast to `dtype` here so
    vjp flows through the cast).
    data: dict of batch arrays (z, t_f, sa, s1a, eps, onehot, cond_mask,
    freqs, m_blk list, m_attn list) — all constants w.r.t. the grad.

    Returns the scalar euclidean epsilon-loss (v1:600-607).
    """
    w = {k: v for k, v in weights.items() if not isinstance(v, list)}
    stages = weights["stages"]

    def mm(a, kernel, bias):
        return jnp.dot(a.astype(dtype), kernel.astype(dtype),
                       preferred_element_type=jnp.float32) + bias

    z, eps = data["z"], data["eps"]
    x_t = data["sa"] * z + data["s1a"] * eps  # q_sample (v1:574-578)

    # Time embedding: sinusoid -> lin1 -> swish -> lin2 (v1:401-418).
    args = data["t_f"] * data["freqs"]
    sin_emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    t_base = mm(_swish(mm(sin_emb, w["wt1"], w["bt1"])), w["wt2"], w["bt2"])

    # Class embedding: table lookup (as onehot matmul) -> MLP (v1:421-431),
    # zeroed per sample by the CFG null-condition mask.
    e_c = jnp.dot(data["onehot"].astype(dtype), w["table"].astype(dtype),
                  preferred_element_type=jnp.float32)
    c_base = mm(_swish(mm(e_c, w["wc1"], w["bc1"])), w["wc2"], w["bc2"])
    c_base = c_base * data["cond_mask"]

    h = mm(x_t, w["wl"], w["bl"])
    for i, s in enumerate(stages):
        # shared_cond_proj quirk (v1:544): class emb through the time proj.
        h = h + mm(t_base + c_base, s["wt"], 2.0 * s["bt"])
        blk = _ln(mm(h, s["wb"], s["bb"]), s["g1"], s["b1"])
        blk = blk * data["m_blk"][i]          # block dropout
        h = h + _swish(blk)
        hn = _ln(h, s["g2"], s["b2"])
        # length-1 attention: out_proj(attn_drop * v_proj(hn))
        v = mm(hn, s["wv"], s["bv"]) * data["m_attn"][i]
        h = h + mm(v, s["wo"], s["bo"])
        h = mm(h, s["wd"], s["bd"])

    h = h + mm(t_base, w["wtf"], w["btf"]) + mm(c_base, w["wcf"], w["bcf"])
    h = _ln(h, w["gf"], w["bf"])
    # epsilon head emits float32 (models/latent_unet.py:130)
    out = jnp.dot(h, w["wf"], preferred_element_type=jnp.float32) + w["bf2"]
    if global_skip:  # v2:561 — same `final` layer on the raw input
        skip = jnp.dot(x_t, w["wf"],
                       preferred_element_type=jnp.float32) + w["bf2"]
        out = out + jax.nn.sigmoid(w["rw"][0, 0]) * skip

    diff = (eps - out)
    # keepdims: 1-D (B,) intermediates trip a Mosaic relayout bug in the
    # transpose pass ("non-singleton logical dimension is replicated")
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=1, keepdims=True) + 1e-8)
    return jnp.mean(dist)


def _weights_spec(params, n_stages):
    """Flat (name, array) list defining the kernel's weight-ref order.

    Biases/LN affines reshaped to (1, d); everything f32 (dtype cast happens
    inside forward_loss so the vjp covers it)."""
    p = params["params"] if "params" in params else params

    def row(x):
        return x.reshape(1, -1).astype(jnp.float32)

    flat = [
        ("wt1", p["time_emb"]["lin1"]["kernel"]),
        ("bt1", row(p["time_emb"]["lin1"]["bias"])),
        ("wt2", p["time_emb"]["lin2"]["kernel"]),
        ("bt2", row(p["time_emb"]["lin2"]["bias"])),
        ("table", p["cond_emb"]["embedding"]["embedding"]),
        ("wc1", p["cond_emb"]["lin1"]["kernel"]),
        ("bc1", row(p["cond_emb"]["lin1"]["bias"])),
        ("wc2", p["cond_emb"]["lin2"]["kernel"]),
        ("bc2", row(p["cond_emb"]["lin2"]["bias"])),
        ("wl", p["latent_proj"]["kernel"]),
        ("bl", row(p["latent_proj"]["bias"])),
    ]
    for i in range(n_stages):
        attn = p[f"attn_{i}"]
        qkv_k, qkv_b = attn["qkv"]["kernel"], attn["qkv"]["bias"]
        d = qkv_k.shape[0]
        flat += [
            (f"s{i}.wt", p[f"time_proj_{i}"]["kernel"]),
            (f"s{i}.bt", row(p[f"time_proj_{i}"]["bias"])),
            (f"s{i}.wb", p[f"block_fc_{i}"]["kernel"]),
            (f"s{i}.bb", row(p[f"block_fc_{i}"]["bias"])),
            (f"s{i}.g1", row(p[f"block_ln_{i}"]["scale"])),
            (f"s{i}.b1", row(p[f"block_ln_{i}"]["bias"])),
            (f"s{i}.g2", row(p[f"stage_ln_{i}"]["scale"])),
            (f"s{i}.b2", row(p[f"stage_ln_{i}"]["bias"])),
            (f"s{i}.wv", qkv_k[:, 2 * d:3 * d]),
            (f"s{i}.bv", row(qkv_b[2 * d:3 * d])),
            (f"s{i}.wo", attn["out"]["kernel"]),
            (f"s{i}.bo", row(attn["out"]["bias"])),
            (f"s{i}.wd", p[f"downsample_{i}"]["kernel"]),
            (f"s{i}.bd", row(p[f"downsample_{i}"]["bias"])),
        ]
    flat += [
        ("wtf", p["final_time_proj"]["kernel"]),
        ("btf", row(p["final_time_proj"]["bias"])),
        ("wcf", p["final_cond_proj"]["kernel"]),
        ("bcf", row(p["final_cond_proj"]["bias"])),
        ("gf", row(p["final_norm"]["scale"])),
        ("bf", row(p["final_norm"]["bias"])),
        ("wf", p["final"]["kernel"]),
        ("bf2", row(p["final"]["bias"])),
        ("rw", p["residual_weight"].reshape(1, 1).astype(jnp.float32)),
    ]
    return flat


def _nest(named, n_stages):
    """(name -> array) mapping into the forward_loss weights dict."""
    d = {k: v for k, v in named.items() if "." not in k}
    d["stages"] = [
        {k.split(".", 1)[1]: v for k, v in named.items()
         if k.startswith(f"s{i}.")}
        for i in range(n_stages)
    ]
    return d


def grads_to_tree(named_grads, params, n_stages):
    """Rebuild the FULL param-pytree gradient from the kernel's outputs:
    packed qkv kernels get zero q/k blocks (exactly what XLA produces for
    the length-1 softmax), residual_weight flows through only under
    global_skip, shapes un-rowed back to the originals."""
    p = params["params"] if "params" in params else params
    g = jax.tree.map(jnp.zeros_like, p)

    def put(dst, keys, val):
        sub = dst
        for k in keys[:-1]:
            sub = sub[k]
        sub[keys[-1]] = val.reshape(sub[keys[-1]].shape).astype(
            sub[keys[-1]].dtype)

    put(g, ("time_emb", "lin1", "kernel"), named_grads["wt1"])
    put(g, ("time_emb", "lin1", "bias"), named_grads["bt1"])
    put(g, ("time_emb", "lin2", "kernel"), named_grads["wt2"])
    put(g, ("time_emb", "lin2", "bias"), named_grads["bt2"])
    put(g, ("cond_emb", "embedding", "embedding"), named_grads["table"])
    put(g, ("cond_emb", "lin1", "kernel"), named_grads["wc1"])
    put(g, ("cond_emb", "lin1", "bias"), named_grads["bc1"])
    put(g, ("cond_emb", "lin2", "kernel"), named_grads["wc2"])
    put(g, ("cond_emb", "lin2", "bias"), named_grads["bc2"])
    put(g, ("latent_proj", "kernel"), named_grads["wl"])
    put(g, ("latent_proj", "bias"), named_grads["bl"])
    for i in range(n_stages):
        put(g, (f"time_proj_{i}", "kernel"), named_grads[f"s{i}.wt"])
        put(g, (f"time_proj_{i}", "bias"), named_grads[f"s{i}.bt"])
        put(g, (f"block_fc_{i}", "kernel"), named_grads[f"s{i}.wb"])
        put(g, (f"block_fc_{i}", "bias"), named_grads[f"s{i}.bb"])
        put(g, (f"block_ln_{i}", "scale"), named_grads[f"s{i}.g1"])
        put(g, (f"block_ln_{i}", "bias"), named_grads[f"s{i}.b1"])
        put(g, (f"stage_ln_{i}", "scale"), named_grads[f"s{i}.g2"])
        put(g, (f"stage_ln_{i}", "bias"), named_grads[f"s{i}.b2"])
        d = g[f"attn_{i}"]["qkv"]["kernel"].shape[0]
        qkv_k = jnp.zeros_like(g[f"attn_{i}"]["qkv"]["kernel"])
        qkv_k = qkv_k.at[:, 2 * d:3 * d].set(
            named_grads[f"s{i}.wv"].astype(qkv_k.dtype))
        g[f"attn_{i}"]["qkv"]["kernel"] = qkv_k
        qkv_b = jnp.zeros_like(g[f"attn_{i}"]["qkv"]["bias"])
        qkv_b = qkv_b.at[2 * d:3 * d].set(
            named_grads[f"s{i}.bv"].reshape(-1).astype(qkv_b.dtype))
        g[f"attn_{i}"]["qkv"]["bias"] = qkv_b
        put(g, (f"attn_{i}", "out", "kernel"), named_grads[f"s{i}.wo"])
        put(g, (f"attn_{i}", "out", "bias"), named_grads[f"s{i}.bo"])
        put(g, (f"downsample_{i}", "kernel"), named_grads[f"s{i}.wd"])
        put(g, (f"downsample_{i}", "bias"), named_grads[f"s{i}.bd"])
    put(g, ("final_time_proj", "kernel"), named_grads["wtf"])
    put(g, ("final_time_proj", "bias"), named_grads["btf"])
    put(g, ("final_cond_proj", "kernel"), named_grads["wcf"])
    put(g, ("final_cond_proj", "bias"), named_grads["bcf"])
    put(g, ("final_norm", "scale"), named_grads["gf"])
    put(g, ("final_norm", "bias"), named_grads["bf"])
    put(g, ("final", "kernel"), named_grads["wf"])
    put(g, ("final", "bias"), named_grads["bf2"])
    g["residual_weight"] = named_grads["rw"].reshape(()).astype(
        g["residual_weight"].dtype)
    return g


_DATA_NAMES = ("z", "t_f", "sa", "s1a", "eps", "onehot", "cond_mask", "freqs")


def _make_kernel(names, n_stages, n_masks, dtype, global_skip):
    n_data = len(_DATA_NAMES) + n_masks

    def kernel(*refs):
        data_refs = refs[:n_data]
        w_refs = refs[n_data:n_data + len(names)]
        out_refs = refs[n_data + len(names):]

        data = {k: data_refs[j][:] for j, k in enumerate(_DATA_NAMES)}
        mask_refs = data_refs[len(_DATA_NAMES):]
        data["m_blk"] = [mask_refs[2 * i][:] for i in range(n_stages)]
        data["m_attn"] = [mask_refs[2 * i + 1][:] for i in range(n_stages)]
        named_w = {k: r[:] for k, r in zip(names, w_refs)}

        def loss_fn(named):
            return forward_loss(
                _nest(named, n_stages), data,
                n_stages=n_stages, dtype=dtype, global_skip=global_skip,
            )

        loss, vjp = jax.vjp(loss_fn, named_w)
        (grads,) = vjp(jnp.float32(1.0))
        out_refs[0][:] = loss.reshape(1, 1)
        for j, k in enumerate(names):
            out_refs[1 + j][:] = grads[k].astype(jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_stages", "dtype", "global_skip", "interpret"),
)
def _kernel_loss_and_grads(w_named, data_args, masks, n_stages, dtype,
                           global_skip, interpret):
    names = tuple(w_named.keys())
    kernel = _make_kernel(names, n_stages, len(masks), dtype, global_skip)
    args = list(data_args) + list(masks) + [w_named[k] for k in names]
    out_shape = [jax.ShapeDtypeStruct((1, 1), jnp.float32)] + [
        jax.ShapeDtypeStruct(w_named[k].shape, jnp.float32) for k in names
    ]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(120 * 1024 * 1024),
        ),
    )(*args)
    loss = outs[0][0, 0]
    named_grads = {k: v for k, v in zip(names, outs[1:])}
    return loss, named_grads


def kernel_supported(model: ConditionalLatentDenoiser) -> bool:
    return model.num_colors is None and model.shared_cond_proj


def make_kernel_denoise_body(model: ConditionalLatentDenoiser, cfg,
                             dtype: Any = jnp.bfloat16,
                             interpret: bool | None = None):
    """Drop-in replacement for train/latent_ddpm.make_latent_denoise_body
    backed by the fused Pallas kernel: denoise(state, sched_arg, z, labels,
    colors, loss_rng, drop_rng, cfg_rng) -> (state, loss). Timestep/noise
    keys reuse ddpm_eps_loss's exact derivation; the optimizer update is the
    state's own optax chain (clip + AdamW [+ EMA]), untouched."""
    if not kernel_supported(model):
        raise ValueError("fused train kernel supports shared_cond_proj "
                         "single-condition variants (v1/v2) only")
    n_stages = len(model.hidden_dims) - 1
    heads = 8
    rate = model.dropout_rate
    half = model.time_emb_dim // 2
    num_classes = model.num_classes

    def denoise(state, sched_arg, z, labels, colors, loss_rng, drop_rng,
                cfg_rng):
        assert colors is None
        b = z.shape[0]
        # --- identical key derivation to ddpm_eps_loss (bitwise-same t/eps)
        t_key, eps_key = jax.random.split(loss_rng)
        t = jax.random.randint(t_key, (b,), 0, sched_arg.n_steps)
        eps = jax.random.normal(eps_key, z.shape, dtype=z.dtype)
        abar = sched_arg.alpha_bar[t][:, None]
        cond_mask = jnp.ones((b, 1), jnp.float32)
        if cfg.cond_dropout > 0.0:
            keep = jax.random.bernoulli(cfg_rng, 1.0 - cfg.cond_dropout, (b,))
            cond_mask = keep.astype(jnp.float32)[:, None]

        # --- dropout masks (i.i.d. Bernoulli from drop_rng; flax Dropout's
        # internal fold-in is not reproduced — documented stream difference)
        masks = []
        if rate > 0.0:
            keys = jax.random.split(drop_rng, 2 * n_stages)
            scale = 1.0 / (1.0 - rate)
            for i in range(n_stages):
                dim = model.hidden_dims[i]
                mb = jax.random.bernoulli(keys[2 * i], 1.0 - rate, (b, dim))
                ma = jax.random.bernoulli(keys[2 * i + 1], 1.0 - rate,
                                          (b, heads))
                masks.append(mb.astype(jnp.float32) * scale)
                masks.append(jnp.repeat(ma.astype(jnp.float32) * scale,
                                        dim // heads, axis=1))
        else:
            for i in range(n_stages):
                dim = model.hidden_dims[i]
                masks.append(jnp.ones((b, dim), jnp.float32))
                masks.append(jnp.ones((b, dim), jnp.float32))

        freqs = jnp.exp(
            jax.lax.iota(jnp.float32, half) * (-math.log(10000.0) / (half - 1))
        ).reshape(1, half)
        data_args = (
            z.astype(jnp.float32),
            t.astype(jnp.float32)[:, None],
            jnp.sqrt(abar).astype(jnp.float32),
            jnp.sqrt(1.0 - abar).astype(jnp.float32),
            eps.astype(jnp.float32),
            jax.nn.one_hot(labels, num_classes, dtype=jnp.float32),
            cond_mask,
            freqs,
        )
        w_named = dict(_weights_spec({"params": state.params}, n_stages))
        interp = (jax.default_backend() != "tpu") if interpret is None else interpret
        loss, named_grads = _kernel_loss_and_grads(
            w_named, data_args, tuple(masks), n_stages=n_stages,
            dtype=dtype, global_skip=model.global_skip, interpret=interp,
        )
        grads = grads_to_tree(named_grads, {"params": state.params}, n_stages)
        if not model.global_skip:
            grads["residual_weight"] = jnp.zeros_like(
                state.params["residual_weight"])
        return state.apply_gradients(grads=grads), loss

    return denoise
