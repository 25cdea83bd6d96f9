"""Whole-epoch Pallas train kernel: N denoiser train steps in ONE kernel.

The per-step fused kernel (kernels/train_step.py) wins 23% on the step but
pays ~90-operand plumbing per call plus full AdamW HBM round-trips (read
w,m,v,g + write w,m,v ≈ 240 MB/step) in XLA. This kernel runs the WHOLE
epoch — every forward, backward, grad-clip, and AdamW update — inside one
Pallas program with the parameters AND Adam moments resident in VMEM for
all steps: per-epoch HBM traffic for the optimizer drops from
steps × 240 MB to exactly one load + one store of (w, m, v).

Same correctness strategy as train_step.py: the forward/loss is the shared
plain-jnp `forward_loss` twin and the backward is in-kernel `jax.vjp` —
AD-derived, no hand gradients. AdamW (clip_by_global_norm -> scale_by_adam
-> weight decay -> -lr) is re-implemented in-kernel in f32 against per-step
LR/bias-correction tables computed OUTSIDE from the optax schedule, and
pinned against optax by tests/test_train_epoch_kernel.py.

Randomness: two modes.
  - test mode (`stochastic=False`): timesteps, noise, and dropout masks
    enter as kernel INPUTS drawn with jax.random using the cached path's
    exact per-step key scheme — the kernel must then match a scan of XLA
    denoise steps numerically (the equivalence test).
  - prod mode (`stochastic=True`): the on-core PRNG (pltpu.prng_random_bits,
    Box-Muller for normals — same generator as kernels/full_sampler.py)
    draws everything in-kernel. The stream differs from jax.random
    (implementation-defined, SURVEY.md §7.3(5)); distribution tested,
    quality A/B'd at the flagship recipe.

Scope/limits (documented, config-gated):
  - cached-latent path only (latent_cache > 0): z rows are inputs; the
    frozen encode never enters the kernel.
  - v1/v2 variants (shared_cond_proj, single condition), single chip.
  - bf16 matmul operands in prod (f32 lane for tests); grads are the vjp
    cotangents of the bf16 forward.
  - per-step weight EMA is applied OUTSIDE once per epoch chunk with
    decay^steps on the epoch-end params (epoch-granular EMA) — keeping the
    EMA tree per-step would add 15-30 MB to a VMEM budget that is already
    ~120 MB (w+m+v f32 = 90 MB at reference width).

Parity target: the loop the reference runs 10,000 epochs of
(v1/model_train_test.py:1241-1264).
"""
from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flowerdiff.kernels.train_step import (
    _DATA_NAMES,  # noqa: F401 (kept for parity greps)
    _nest,
    _weights_spec,
    forward_loss,
    grads_to_tree,
    kernel_supported,
)
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser

_TWO_PI = 2.0 * math.pi


def _normal(shape):
    """Box-Muller standard normal from the on-core PRNG (see
    kernels/full_sampler.py for the sign-extension war story)."""
    bits_a = pltpu.prng_random_bits(shape)
    bits_b = pltpu.prng_random_bits(shape)
    mask = jnp.int32(0x00FFFFFF)
    u1 = (bits_a & mask).astype(jnp.float32) * (1.0 / (1 << 24))
    u2 = (bits_b & mask).astype(jnp.float32) * (1.0 / (1 << 24))
    u1 = jnp.maximum(u1, 1e-7)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _uniform(shape):
    bits = pltpu.prng_random_bits(shape)
    return (bits & jnp.int32(0x00FFFFFF)).astype(jnp.float32) * (1.0 / (1 << 24))


def _grad_is_bf16(k: str) -> bool:
    """Leaves whose matmul operand (and hence vjp cotangent) is bf16 in the
    bf16 fast path — must match rd() in the kernel body below."""
    leaf = k.split(".")[-1]
    return (leaf.startswith("w") and leaf != "wf") or k == "table"


def _make_epoch_kernel(names, n_stages, hidden, heads, steps, batch,
                       n_steps_sched, num_classes, dtype, global_skip,
                       dropout_rate, cond_dropout, grad_clip, weight_decay,
                       b1, b2, eps_adam, stochastic, n_mask_inputs,
                       grad_scratch):
    n_names = len(names)

    def kernel(*refs):
        it = iter(refs)
        seed_ref = next(it)        # (1,1) int32 SMEM
        z_ref = next(it)           # (S*B, L)
        onehot_ref = next(it)      # (S*B, C)
        lr_ref = next(it)          # (S, 1)
        bc1_ref = next(it)         # (S, 1) = 1 - b1^(count+i+1)
        bc2_ref = next(it)         # (S, 1)
        abar_ref = next(it)        # (n_steps, 1)
        freqs_ref = next(it)       # (1, half)
        if not stochastic:
            t_ref = next(it)       # (S*B, 1) f32 timestep indices
            eps_ref = next(it)     # (S*B, L)
            mask_refs = [next(it) for _ in range(n_mask_inputs)]
            cmask_ref = next(it)   # (S*B, 1)
        w_refs = {k: next(it) for k in names}
        m_refs = {k: next(it) for k in names}
        v_refs = {k: next(it) for k in names}
        loss_ref = next(it)        # (S, 1) output
        w_out = {k: next(it) for k in names}
        m_out = {k: next(it) for k in names}
        v_out = {k: next(it) for k in names}
        # grad-parking scratch (the reference-width VMEM fix): one explicit
        # VMEM buffer per leaf ends each vjp cotangent's SSA live range at
        # a store, instead of keeping all 76 grads alive as vregs through
        # the unrolled AdamW chain — the allocator spill slots (59.6 MB at
        # reference width) were what pushed 174.5M > 128M VMEM.
        g_scratch = {k: next(it) for k in names} if grad_scratch else None

        if stochastic:
            pltpu.prng_seed(seed_ref[0, 0])

        L = z_ref.shape[-1]
        C = onehot_ref.shape[-1]

        def step(i, _):
            z = z_ref[pl.ds(i * batch, batch), :]
            onehot = onehot_ref[pl.ds(i * batch, batch), :]

            if stochastic:
                # t ~ U{0..n_steps-1} (float index), masks ~ Bernoulli
                t_f = jnp.floor(
                    _uniform((batch, 1)) * float(n_steps_sched))
                t_f = jnp.minimum(t_f, float(n_steps_sched - 1))
                eps = _normal((batch, L))
                if cond_dropout > 0.0:
                    cmask = (_uniform((batch, 1))
                             >= cond_dropout).astype(jnp.float32)
                else:
                    cmask = jnp.ones((batch, 1), jnp.float32)
                m_blk, m_attn = [], []
                scale = 1.0 / (1.0 - dropout_rate) if dropout_rate else 1.0
                for si in range(n_stages):
                    dim = hidden[si]
                    if dropout_rate > 0.0:
                        mb = (_uniform((batch, dim))
                              >= dropout_rate).astype(jnp.float32) * scale
                        ma_h = (_uniform((batch, heads))
                                >= dropout_rate).astype(jnp.float32) * scale
                        # expand per-head mask across head_dim lanes via a
                        # one-hot matmul (no gathers in Mosaic)
                        hd = dim // heads
                        # integer iota only (tpu.iota rejects float results)
                        hrow = jax.lax.broadcasted_iota(
                            jnp.int32, (heads, dim), 0)
                        fcol = jax.lax.broadcasted_iota(
                            jnp.int32, (heads, dim), 1) // hd
                        expand = (hrow == fcol).astype(jnp.float32)
                        ma = jnp.dot(ma_h, expand,
                                     preferred_element_type=jnp.float32)
                    else:
                        mb = jnp.ones((batch, dim), jnp.float32)
                        ma = jnp.ones((batch, dim), jnp.float32)
                    m_blk.append(mb)
                    m_attn.append(ma)
            else:
                t_f = t_ref[pl.ds(i * batch, batch), :]
                eps = eps_ref[pl.ds(i * batch, batch), :]
                cmask = cmask_ref[pl.ds(i * batch, batch), :]
                m_blk = [mask_refs[2 * si][pl.ds(i * batch, batch), :]
                         for si in range(n_stages)]
                m_attn = [mask_refs[2 * si + 1][pl.ds(i * batch, batch), :]
                          for si in range(n_stages)]

            # abar[t] via one-hot matmul (no dynamic row gather in Mosaic;
            # integer iota only)
            tcol = jax.lax.broadcasted_iota(
                jnp.int32, (batch, n_steps_sched), 1).astype(jnp.float32)
            t_onehot = (jnp.abs(tcol - t_f) < 0.5).astype(jnp.float32)
            abar = jnp.dot(t_onehot, abar_ref[:],
                           preferred_element_type=jnp.float32)

            data = {
                "z": z, "t_f": t_f,
                "sa": jnp.sqrt(abar), "s1a": jnp.sqrt(1.0 - abar),
                "eps": eps, "onehot": onehot, "cond_mask": cmask,
                "freqs": freqs_ref[:], "m_blk": m_blk, "m_attn": m_attn,
            }
            # In the bf16 fast path, read the large matmul operands as bf16
            # values: halves the per-step transient VMEM (weights + vjp
            # cotangents) on top of the 90 MB resident w/m/v. Grads for
            # those leaves are then bf16-rounded at the vjp boundary
            # (documented; the f32 test lane reads f32).
            if dtype == jnp.bfloat16:
                def rd(k, r):
                    # "wf" stays f32: the epsilon head computes in f32
                    return (r[:].astype(jnp.bfloat16)
                            if _grad_is_bf16(k) else r[:])
                named_w = {k: rd(k, r) for k, r in w_refs.items()}
            else:
                named_w = {k: r[:] for k, r in w_refs.items()}

            def loss_fn(named):
                return forward_loss(
                    _nest(named, n_stages), data, n_stages=n_stages,
                    dtype=dtype, global_skip=global_skip)

            loss, vjp = jax.vjp(loss_fn, named_w)
            (grads,) = vjp(jnp.float32(1.0))

            if grad_scratch:
                # park every cotangent in VMEM scratch immediately; the
                # norm + update below re-load per leaf (exact: same-dtype
                # store/load roundtrip), so no grad value stays live as a
                # vreg across the whole unrolled chain
                for k in names:
                    g_scratch[k][:] = grads[k]
                grads = {k: None for k in names}

                def _g(k):
                    return g_scratch[k][:].astype(jnp.float32)
            else:
                def _g(k):
                    return grads[k].astype(jnp.float32)

            # clip_by_global_norm(grad_clip), f32
            sq = jnp.float32(0.0)
            for k in names:
                g = _g(k)
                sq = sq + jnp.sum(g * g)
            gnorm = jnp.sqrt(sq)
            cscale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-16))

            lr = lr_ref[i, 0]
            bc1 = bc1_ref[i, 0]
            bc2 = bc2_ref[i, 0]
            for k in names:
                g = _g(k) * cscale
                # moments may be bf16-resident (moments_dtype — the VMEM
                # lever: w+m+v f32 = 90 MB did not fit); math stays f32
                m_new = b1 * m_refs[k][:].astype(jnp.float32) + (1.0 - b1) * g
                v_new = (b2 * v_refs[k][:].astype(jnp.float32)
                         + (1.0 - b2) * g * g)
                mhat = m_new / bc1
                vhat = v_new / bc2
                w = w_refs[k][:]
                upd = mhat / (jnp.sqrt(vhat) + eps_adam) + weight_decay * w
                w_refs[k][:] = w - lr * upd
                m_refs[k][:] = m_new.astype(m_refs[k].dtype)
                v_refs[k][:] = v_new.astype(v_refs[k].dtype)
            loss_ref[pl.ds(i, 1), :] = loss.reshape(1, 1)
            return 0

        jax.lax.fori_loop(0, steps, step, 0)
        for k in names:
            w_out[k][:] = w_refs[k][:]
            m_out[k][:] = m_refs[k][:]
            v_out[k][:] = v_refs[k][:]

    return kernel


def _adam_state(opt_state):
    """Locate the ScaleByAdamState inside an optax chain state."""
    found = []

    def rec(s):
        if hasattr(s, "mu") and hasattr(s, "nu") and hasattr(s, "count"):
            found.append(s)
            return
        if isinstance(s, (tuple, list)):
            for x in s:
                rec(x)

    rec(opt_state)
    assert len(found) == 1, f"expected one adam state, found {len(found)}"
    return found[0]


def _replace_adam(opt_state, new_adam):
    if hasattr(opt_state, "mu") and hasattr(opt_state, "nu"):
        return new_adam
    if isinstance(opt_state, tuple):
        rebuilt = tuple(_replace_adam(s, new_adam) for s in opt_state)
        if hasattr(opt_state, "_fields"):  # NamedTuple
            return type(opt_state)(*rebuilt)
        return rebuilt
    return opt_state


def make_mega_epoch_fn(model: ConditionalLatentDenoiser, cfg,
                       steps_per_epoch: int, batch: int,
                       dtype: Any = jnp.bfloat16,
                       stochastic: bool = True,
                       interpret: bool | None = None,
                       moments_dtype: Any = None,
                       grad_scratch: bool = True):
    """fn(state, sched_arg, z_rows (S,B,L), labels (S,B), rng)
    -> (state', losses (S,)) — one whole epoch per pallas_call, Adam state
    VMEM-resident, for the latent-cache path. See module docstring."""
    if not kernel_supported(model):
        raise ValueError("mega epoch kernel supports v1/v2 variants only")
    n_stages = len(model.hidden_dims) - 1
    hidden = tuple(model.hidden_dims)
    heads = 8
    half = model.time_emb_dim // 2
    S, B = steps_per_epoch, batch
    from flowerdiff.train.schedules import cosine_warm_restarts_schedule

    lr_sched = cosine_warm_restarts_schedule(
        cfg.lr, cfg.steps_per_epoch, cfg.t0, cfg.t_mult)
    b1, b2, eps_adam = 0.9, 0.999, 1e-8

    def epoch_fn(state, sched_arg, z_rows, labels, rng):
        if interpret is None:
            interp = jax.default_backend() != "tpu"
        else:
            interp = interpret
        names_arrays = _weights_spec({"params": state.params}, n_stages)
        names = tuple(k for k, _ in names_arrays)
        w_in = [a for _, a in names_arrays]
        adam = _adam_state(state.opt_state)
        m_named = dict(_weights_spec({"params": adam.mu}, n_stages))
        v_named = dict(_weights_spec({"params": adam.nu}, n_stages))
        # moments_dtype=bf16 (prod default at reference width): resident
        # w f32 + m,v bf16 = 60 MB instead of the 90 MB that overflowed
        # VMEM; the per-epoch f32<->bf16 roundtrip quantizes moments like
        # bf16 storage would (documented deviation from optax f32).
        mdt = moments_dtype
        if mdt is None:
            mdt = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
        m_in = [m_named[k].astype(mdt) for k in names]
        v_in = [v_named[k].astype(mdt) for k in names]

        count0 = adam.count
        steps_ix = count0 + jnp.arange(S, dtype=count0.dtype)
        lr_t = jax.vmap(lr_sched)(steps_ix).reshape(S, 1).astype(jnp.float32)
        bc1_t = (1.0 - b1 ** (steps_ix + 1).astype(jnp.float32)).reshape(S, 1)
        bc2_t = (1.0 - b2 ** (steps_ix + 1).astype(jnp.float32)).reshape(S, 1)

        z_flat = z_rows.reshape(S * B, -1).astype(jnp.float32)
        onehot = jax.nn.one_hot(
            labels.reshape(S * B), model.num_classes, dtype=jnp.float32)
        freqs = jnp.exp(
            jax.lax.iota(jnp.float32, half)
            * (-math.log(10000.0) / (half - 1))).reshape(1, half)
        seed = jax.random.randint(rng, (1, 1), 0, 2**31 - 1, jnp.int32)

        data_args = [seed, z_flat, onehot, lr_t, bc1_t, bc2_t,
                     sched_arg.alpha_bar.reshape(-1, 1).astype(jnp.float32),
                     freqs]
        n_mask_inputs = 2 * n_stages
        if not stochastic:
            # exact test lane: draw with the cached path's key scheme
            rate = model.dropout_rate
            t_all, eps_all, cm_all = [], [], []
            masks_all = [[] for _ in range(n_mask_inputs)]
            for i in range(S):
                step_key = jax.random.fold_in(
                    jax.random.fold_in(rng, i), count0 + i)
                _, loss_rng, drop_rng, cfg_rng = jax.random.split(step_key, 4)
                t_key, eps_key = jax.random.split(loss_rng)
                t = jax.random.randint(t_key, (B,), 0, sched_arg.n_steps)
                t_all.append(t.astype(jnp.float32)[:, None])
                eps_all.append(jax.random.normal(eps_key, (B, z_flat.shape[-1])))
                if cfg.cond_dropout > 0.0:
                    keep = jax.random.bernoulli(
                        cfg_rng, 1.0 - cfg.cond_dropout, (B,))
                    cm_all.append(keep.astype(jnp.float32)[:, None])
                else:
                    cm_all.append(jnp.ones((B, 1), jnp.float32))
                mkeys = jax.random.split(drop_rng, n_mask_inputs)
                scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
                for si in range(n_stages):
                    dim = hidden[si]
                    if rate > 0.0:
                        mb = jax.random.bernoulli(
                            mkeys[2 * si], 1.0 - rate, (B, dim)
                        ).astype(jnp.float32) * scale
                        ma = jnp.repeat(jax.random.bernoulli(
                            mkeys[2 * si + 1], 1.0 - rate, (B, heads)
                        ).astype(jnp.float32) * scale, dim // heads, axis=1)
                    else:
                        mb = jnp.ones((B, dim), jnp.float32)
                        ma = jnp.ones((B, dim), jnp.float32)
                    masks_all[2 * si].append(mb)
                    masks_all[2 * si + 1].append(ma)
            data_args += [jnp.concatenate(t_all), jnp.concatenate(eps_all)]
            data_args += [jnp.concatenate(ms) for ms in masks_all]
            data_args += [jnp.concatenate(cm_all)]

        args = data_args + w_in + m_in + v_in
        n_data = len(data_args)
        n = len(names)
        out_shape = (
            [jax.ShapeDtypeStruct((S, 1), jnp.float32)]
            + [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in w_in]
            + [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in m_in]
            + [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in v_in]
        )
        # alias w/m/v inputs onto their outputs: one resident copy in VMEM
        aliases = {}
        for j in range(3 * n):
            aliases[n_data + j] = 1 + j

        kernel = _make_epoch_kernel(
            names, n_stages, hidden, heads, S, B, int(sched_arg.n_steps),
            model.num_classes, dtype, model.global_skip,
            model.dropout_rate, cfg.cond_dropout, cfg.grad_clip,
            cfg.weight_decay, b1, b2, eps_adam, stochastic, n_mask_inputs,
            grad_scratch)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args[1:]
        ]
        scratch_shapes = []
        if grad_scratch:
            # one VMEM grad buffer per leaf, in the cotangent's dtype (bf16
            # for the bf16-read matmul weights: halves the parking cost)
            for j, k in enumerate(names):
                gdt = (jnp.bfloat16
                       if dtype == jnp.bfloat16 and _grad_is_bf16(k)
                       else jnp.float32)
                scratch_shapes.append(pltpu.VMEM(w_in[j].shape, gdt))
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                       for _ in out_shape],
            input_output_aliases=aliases,
            scratch_shapes=scratch_shapes,
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(127 * 1024 * 1024),
            ),
        )(*args)

        losses = outs[0].reshape(S)
        new_w = {k: v for k, v in zip(names, outs[1:1 + n])}
        new_m = {k: v for k, v in zip(names, outs[1 + n:1 + 2 * n])}
        new_v = {k: v for k, v in zip(names, outs[1 + 2 * n:1 + 3 * n])}

        # The kernel carries only the v-slice of each packed qkv. The q/k
        # blocks have exactly ZERO gradient (length-1 softmax) so their Adam
        # moments stay zero — but optax.adamw still applies weight decay to
        # them every step: w <- w * (1 - lr_i * wd). Apply the accumulated
        # per-epoch factor outside.
        qk_factor = jnp.prod(1.0 - lr_t.reshape(-1) * cfg.weight_decay)
        params = _params_from_named(new_w, state.params, n_stages, qk_factor)
        mu = grads_to_tree(new_m, {"params": adam.mu}, n_stages)
        nu = grads_to_tree(new_v, {"params": adam.nu}, n_stages)
        new_adam = adam._replace(count=count0 + S, mu=mu, nu=nu)
        new_state = state.replace(
            params=params,
            opt_state=_replace_adam(state.opt_state, new_adam),
            step=state.step + S,
        )
        ema = getattr(state, "ema_params", None)
        if ema is not None:
            # epoch-granular EMA (see module docstring): decay^S toward the
            # epoch-end params.
            d_e = float(state.ema_decay) ** S
            new_state = new_state.replace(ema_params=jax.tree.map(
                lambda e, p: d_e * e + (1.0 - d_e) * p, ema, params))
        return new_state, losses

    return epoch_fn


def _params_from_named(named, params, n_stages, qk_factor):
    """Rebuild the params tree from the kernel's updated named weights,
    decaying the kernel-invisible q/k blocks by the accumulated AdamW
    weight-decay factor (their grads and moments are exactly zero)."""
    tree = grads_to_tree(named, {"params": params}, n_stages)
    for i in range(n_stages):
        qkv_k = params[f"attn_{i}"]["qkv"]["kernel"]
        qkv_b = params[f"attn_{i}"]["qkv"]["bias"]
        d = qkv_k.shape[0]
        new_k = tree[f"attn_{i}"]["qkv"]["kernel"]
        new_k = new_k.at[:, : 2 * d].set(qkv_k[:, : 2 * d] * qk_factor)
        tree[f"attn_{i}"]["qkv"]["kernel"] = new_k
        new_b = tree[f"attn_{i}"]["qkv"]["bias"]
        new_b = new_b.at[: 2 * d].set(qkv_b[: 2 * d] * qk_factor)
        tree[f"attn_{i}"]["qkv"]["bias"] = new_b
    return tree
