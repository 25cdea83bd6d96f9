"""Production sampling service.

The deployment-facing API over the fastest inference path: the whole-reverse-
process Pallas kernel (kernels/full_sampler.py) for the latent DDPM plus the
jitted VAE decoder. One `SamplingService` holds prepared bf16 weights and
compiled programs; request latency at reference width is ~3 ms for a 50-image
class-conditional batch of 1000-step ancestral samples on one TPU v5e chip
(see BASELINE.md), ~10 ms including decode.

Batch bucketing: every sampling program specializes on the (static) batch
size, so serving arbitrary request sizes naively would recompile per new
size (a multi-second Pallas/XLA compile mid-request). Requests are instead
padded up to a small ladder of bucket sizes and sliced back after decode —
any request size compiles at most `len(buckets)` programs, and `warmup()`
pre-compiles chosen buckets at deploy time so no request ever pays a
compile.

Example:
    service = SamplingService(model, params, vae, vae_params)
    service.warmup(jax.random.key(0), buckets=(16, 64))   # optional
    images = service.sample_classes([0, 5, 17], n_per_class=5,
                                    rng=jax.random.key(0))
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from flowerdiff.diffusion import DiffusionSchedule, linear_schedule
from flowerdiff.diffusion.api import DiffusionSampler, FusedDiffusionSampler
from flowerdiff.models.latent_unet import ConditionalLatentDenoiser
from flowerdiff.models.vae import FlowerVAE

DEFAULT_BUCKETS = (8, 16, 32, 64, 128, 256, 512)


class SamplingService:
    def __init__(
        self,
        model: ConditionalLatentDenoiser,
        params: dict,
        vae: FlowerVAE,
        vae_params: dict,
        sched: Optional[DiffusionSchedule] = None,
        use_fused: Optional[bool] = None,
        buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
        latent_stats=None,
        clip_x0: Optional[float] = None,
        sampler_kind: str = "ancestral",
        ddim_steps: int = 50,
        quantize_uint8: bool = False,
        decode_bf16: bool = False,
    ):
        """latent_stats: (mean, std) per-dim arrays when the model was
        trained z-scored (runner saves them as latent_stats.npz).
        clip_x0: sampling-time x0-thresholding bound (match the training
        preset's clip_denoised).
        sampler_kind: 'ancestral' (the reference's 1000 sequential steps,
        v1:594-598, as one compiled scan / Pallas kernel) or 'ddim' —
        deterministic accelerated sampling over `ddim_steps` strided
        timesteps for latency-sensitive serving.
        quantize_uint8: quantize decoded images to uint8 ON DEVICE —
        4x fewer device->host bytes than f32 on the serving-critical D2H
        path (the tunnel transfer dominated the round-3 ceiling;
        artifacts/serving_smoke). PNG encoding consumes uint8 anyway;
        float consumers divide by 255.
        decode_bf16: run the decoder convs in bf16 compute dtype (params
        stay f32). The f32 decode measured 20.4% MFU vs the sampler
        kernel's ~83% (round 5, BASELINE.md); bf16 is 1.45x on-chip and
        matches f32 to sub-uint8-quantization error
        (tests/test_bf16_resident.py::TestBF16Decode). Output is cast back
        to f32 (or quantized to uint8 as usual), so consumers see the same
        contract."""
        if decode_bf16:
            vae = vae.clone(dtype=jnp.bfloat16)
        self.decode_bf16 = decode_bf16
        self.model = model
        self.params = params
        self.sched = sched or linear_schedule()
        if use_fused is None:
            use_fused = jax.default_backend() == "tpu"
        self.use_fused = use_fused
        self.buckets = tuple(sorted(buckets))
        assert self.buckets, "need at least one bucket size"
        cls = FusedDiffusionSampler if use_fused else DiffusionSampler
        self.sampler = cls(model, params, self.sched, (model.latent_dim,),
                           clip_x0=clip_x0)
        if latent_stats is not None:
            from flowerdiff.diffusion.api import NormalizedSampler

            self.sampler = NormalizedSampler(self.sampler, *latent_stats)
        if sampler_kind == "ddim":
            from flowerdiff.diffusion.api import DDIMSampler

            self.sampler = DDIMSampler(self.sampler, num_steps=ddim_steps)
        elif sampler_kind != "ancestral":
            raise ValueError(f"unknown sampler_kind {sampler_kind!r}")
        self._vae_params = (
            vae_params if "params" in vae_params else {"params": vae_params}
        )
        self.quantize_uint8 = quantize_uint8

        # params as jit arguments (closure constants would be re-staged per
        # call and blow up compile time)
        def _dec(vp, z):
            img = vae.apply(vp, z, method=FlowerVAE.decode)
            img = img.astype(jnp.float32)  # no-op unless decode_bf16
            if quantize_uint8:
                img = jnp.round(
                    jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
            return img

        self._decode_jit = jax.jit(_dec)
        self._decode = lambda z: self._decode_jit(self._vae_params, z)

        # ONE-dispatch request pipeline: sample -> decode -> quantize as a
        # single program per bucket. On the tunneled-chip deployment each
        # dispatch costs a full round-trip; splitting sample and decode into
        # two dispatches put ~2x the RTT on every chunk (measured in
        # artifacts/serving_smoke/bench_serving_r4*.json).
        def _pipe(vp, rng, *cond):
            lat = self.sampler.sample(rng, int(cond[0].shape[0]), *cond)
            return _dec(vp, lat)

        self._pipe_jit = jax.jit(_pipe)

    def bucket_size(self, n: int) -> int:
        """Smallest bucket >= n (n <= the largest bucket)."""
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"{n} exceeds the largest bucket {self.buckets[-1]}; "
            "oversize requests are chunked via request_plan()"
        )

    def request_plan(self, n: int) -> list[int]:
        """Bucket sizes to run for an n-image request: full top-bucket
        chunks plus one ladder bucket for the tail. Total padding waste is
        bounded by one ladder step (a 513-image request with a 512 top
        bucket runs [512, 8] = 520 sampled, not a 1024 mega-batch), and the
        compiled-program set stays bounded by the ladder."""
        top = self.buckets[-1]
        plan = [top] * (n // top)
        rest = n % top
        if rest:
            plan.append(self.bucket_size(rest))
        return plan or [self.buckets[0]]

    def warmup(
        self,
        rng: jax.Array,
        buckets: Optional[Sequence[int]] = None,
        with_colors: bool = False,
    ) -> None:
        """Pre-compile the sampling + decode programs for the given buckets
        (default: all) so no live request pays a compile. Warms through the
        exact live path — host np.int32 conditions in, np images out — so
        the host->device transfer programs are compiled too (warming with
        device arrays leaves a ~0.7 s first-request transfer-path compile,
        measured in artifacts/serving_smoke/bench_serving_r3.json)."""
        import numpy as np

        for b in buckets or self.buckets:
            classes = np.zeros((b,), np.int32)
            colors = np.zeros((b,), np.int32) if with_colors else None
            self.sample(classes, rng, colors, decode=True)

    @staticmethod
    def _pad(arr, target: int):
        n = arr.shape[0]
        if n == target:
            return arr
        import numpy as np

        return np.concatenate([arr, np.zeros((target - n,), arr.dtype)])

    def sample_async(self, classes, rng: jax.Array, colors=None,
                     decode: bool = True):
        """Phase 1 of a request: dispatch the request as bucket-sized chunks
        (request_plan) and return a zero-argument ``fetch()`` that completes
        phase 2 (host fetch + tail slicing). Each chunk folds the request
        rng with its index so results are deterministic for a given
        (rng, request).

        The split exists so a caller that owns several requests — the HTTP
        coalescing batcher — can DISPATCH window i+1 while window i's D2H
        is still in flight (double-buffered serving): JAX dispatch is
        async and copy_to_host_async starts the transfer eagerly, so the
        only serialization point is the np.asarray in fetch().

        All request-shaping (slice / pad / tail concat) happens host-side in
        NumPy: only bucket-shaped programs ever reach the device, so
        `warmup()` really does pre-pay every compile. jnp ops here would
        silently specialize on each new request size — measured ~1.3 s of
        tiny-op XLA compiles per novel size on the first live request
        (artifacts/serving_smoke/bench_serving_r3.json history)."""
        import numpy as np

        classes = np.asarray(classes, np.int32).reshape(-1)
        if colors is not None:
            colors = np.asarray(colors, np.int32).reshape(-1)
        n = classes.shape[0]
        # Dispatch EVERY chunk before fetching any: chunk i's D2H transfer
        # (started eagerly with copy_to_host_async) overlaps chunk i+1's
        # sampling compute. An np.asarray-per-chunk would force a full sync
        # between chunks — zero compute/transfer overlap on the
        # tunneled-chip deployment.
        pending = []
        start = 0
        for i, b in enumerate(self.request_plan(n)):
            take = min(b, n - start)
            cls_chunk = self._pad(classes[start:start + take], b)
            cond = (cls_chunk,)
            if colors is not None:
                cond = (cls_chunk, self._pad(colors[start:start + take], b))
            # Pad through sampling AND decode so both programs see bucket
            # shapes; slice each chunk back to its real size on the host.
            if decode:
                out = self._pipe_jit(self._vae_params,
                                     jax.random.fold_in(rng, i), *cond)
            else:
                out = self.sampler.sample(jax.random.fold_in(rng, i), b,
                                          *cond)
            try:
                out.copy_to_host_async()
            except AttributeError:  # non-jax array (tests with stub samplers)
                pass
            pending.append((out, take))
            start += take

        def fetch():
            # Phase 2 — fetch in order (transfers already in flight).
            outs = [np.asarray(out)[:take] for out, take in pending]
            return outs[0] if len(outs) == 1 else np.concatenate(outs)

        return fetch

    def _chunked(self, classes, colors, rng: jax.Array, decode: bool):
        return self.sample_async(classes, rng, colors, decode=decode)()

    def sample(
        self,
        classes: jax.Array,
        rng: jax.Array,
        colors: Optional[jax.Array] = None,
        decode: bool = True,
    ) -> jax.Array:
        """Per-element conditioned request: classes (and optionally colors)
        give the condition for EACH output row. Decoded (N, 64, 64, 3)
        images, or raw latents with decode=False (host np.ndarray either
        way). This is the entry the HTTP front-end's coalescer uses
        (serving_http.py) — arbitrary per-row conditions, one bucketed
        device dispatch."""
        return self._chunked(classes, colors, rng, decode=decode)

    def sample_latents(
        self,
        classes: jax.Array,
        rng: jax.Array,
        colors: Optional[jax.Array] = None,
    ) -> jax.Array:
        return self.sample(classes, rng, colors, decode=False)

    def decode_latents(self, latents):
        """Decode (N, latent_dim) latents -> (N, 64, 64, 3) np images via
        the warm bucket-shaped decode programs (pad to the ladder, slice
        back on host — same no-novel-shapes rule as _chunked)."""
        import numpy as np

        latents = np.asarray(latents, np.float32)
        n = latents.shape[0]
        outs = []
        start = 0
        for b in self.request_plan(n):
            take = min(b, n - start)
            chunk = latents[start:start + take]
            if take < b:
                chunk = np.concatenate(
                    [chunk, np.zeros((b - take,) + chunk.shape[1:],
                                     np.float32)])
            outs.append(np.asarray(self._decode(chunk))[:take])
            start += take
        return outs[0] if len(outs) == 1 else np.concatenate(outs)

    def animate(
        self,
        class_idx: int,
        rng: jax.Array,
        color: Optional[int] = None,
        num_frames: int = 50,
        fps: int = 10,
        label: Optional[str] = None,
    ) -> bytes:
        """One diffusion animation as GIF bytes — the serving form of
        create_diffusion_animation (reference v1:884-960: denoise once,
        re-noise the clean latent to a ping-pong timestep list with one
        fixed eps, one frame per t).

        Built entirely from warm programs: the clean latent rides the
        bucketed sampler, the per-frame q_sample mix is host NumPy (an
        elementwise op on (frames, latent) — device dispatch would compile
        per num_frames value), and frames decode through decode_latents'
        padded ladder. No request ever compiles.
        """
        import numpy as np

        from flowerdiff.viz.animation import (
            _pingpong_timesteps,
            _render_frame,
            encode_gif,
        )

        sample_key, noise_key = jax.random.split(rng)
        cls = np.full((1,), class_idx, np.int32)
        col = np.full((1,), color, np.int32) if color is not None else None
        clean = np.asarray(
            self.sample(cls, sample_key, col, decode=False))  # (1, D)

        timesteps = _pingpong_timesteps(self.sched.n_steps, num_frames)
        ts = np.asarray(timesteps, np.int64)
        eps = np.asarray(jax.random.normal(noise_key, (1, clean.shape[1])))
        alpha_bar = np.asarray(self.sched.alpha_bar)[ts][:, None]
        frames_latent = (np.sqrt(alpha_bar) * clean
                         + np.sqrt(1.0 - alpha_bar) * eps)
        # t == 0 frames show the clean latent itself (v1:930 gates on t>0).
        frames_latent[ts == 0] = clean

        decoded = self.decode_latents(frames_latent)
        name = label if label is not None else str(class_idx)
        n_steps = self.sched.n_steps
        frames = [
            _render_frame(
                decoded[i],
                f"Class: {name} (t={t}, {t / n_steps * 100:.1f}% noise)",
            )
            for i, t in enumerate(timesteps)
        ]
        return encode_gif(frames, fps)

    def sample_classes(
        self,
        class_ids: Sequence[int],
        n_per_class: int,
        rng: jax.Array,
        colors: Optional[Sequence[int]] = None,
    ) -> jax.Array:
        """Decoded (N, 64, 64, 3) images, one row block per requested class."""
        import numpy as np

        classes = np.repeat(np.asarray(class_ids, np.int32), n_per_class)
        color_arr = (
            np.repeat(np.asarray(colors, np.int32), n_per_class)
            if colors is not None else None
        )
        return self._chunked(classes, color_arr, rng, decode=True)


class PixelSamplingService:
    """Deployment API for the unconditional pixel family (v4/v5).

    Same bucket-ladder design as :class:`SamplingService` — every sampling
    program specializes on the static batch size, so requests pad up to a
    small ladder of pre-compilable buckets and oversize requests chunk into
    bucket-sized sub-batches.  The reference has no serving story for its
    pixel DDPM (v4/model_train_test.py:272-286 samples inline after
    training); this wraps the same 1000-step reverse process (or DDIM) as
    compiled scan programs.

    Pixel buckets default smaller than latent ones: one 64x64x3 sample is
    ~2,000x the state of a 256-d latent, so HBM and compile time bound the
    useful ladder.
    """

    def __init__(
        self,
        model,
        params: dict,
        sched: Optional[DiffusionSchedule] = None,
        buckets: Tuple[int, ...] = (4, 16, 64),
        clip_x0: Optional[float] = 1.0,
        sampler_kind: str = "ancestral",
        ddim_steps: int = 50,
        img_size: int = 64,
        quantize_uint8: bool = False,
    ):
        self.model = model  # no num_classes/num_colors attrs: unconditional
        self.sched = sched or linear_schedule()
        self.buckets = tuple(sorted(buckets))
        assert self.buckets, "need at least one bucket size"
        self.quantize_uint8 = quantize_uint8
        if quantize_uint8:
            # on-device clip+quantize: 4x fewer D2H bytes than f32 —
            # and pixel rows are 2,000x latent rows, so this path is the
            # one that actually saturated the tunnel.
            self._post = jax.jit(lambda x: jnp.round(
                jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.uint8))
        else:
            self._post = jax.jit(lambda x: jnp.clip(x, 0.0, 1.0))
        self.sampler = DiffusionSampler(
            model, params, self.sched, (img_size, img_size, 3),
            clip_x0=clip_x0,
        )
        if sampler_kind == "ddim":
            from flowerdiff.diffusion.api import DDIMSampler

            self.sampler = DDIMSampler(self.sampler, num_steps=ddim_steps)
        elif sampler_kind != "ancestral":
            raise ValueError(f"unknown sampler_kind {sampler_kind!r}")

    bucket_size = SamplingService.bucket_size
    request_plan = SamplingService.request_plan

    def warmup(self, rng: jax.Array,
               buckets: Optional[Sequence[int]] = None) -> None:
        for b in buckets or self.buckets:
            self.sample_images(b, rng)

    def sample(self, classes, rng: jax.Array, colors=None, decode=True):
        """Batcher-compatible entry (mirrors SamplingService.sample): the
        pixel family is unconditional, so only the row count of `classes`
        matters (the HTTP layer passes a zeros placeholder built from the
        request's "n"). colors / raw latents are not a thing here."""
        import numpy as np

        assert colors is None, "pixel family has no color conditioning"
        assert decode, "pixel family has no latent space to return"
        n = int(np.asarray(classes).reshape(-1).shape[0])
        return self.sample_images(n, rng)

    def sample_async(self, classes, rng: jax.Array, colors=None,
                     decode: bool = True):
        """Dispatch-now / fetch-later form of :meth:`sample` (same contract
        as SamplingService.sample_async) — lets the HTTP batcher overlap
        this window's D2H with the next window's sampling."""
        import numpy as np

        assert colors is None, "pixel family has no color conditioning"
        assert decode, "pixel family has no latent space to return"
        n = int(np.asarray(classes).reshape(-1).shape[0])
        pending = []
        start = 0
        for i, b in enumerate(self.request_plan(n)):
            take = min(b, n - start)
            x = self._post(self.sampler.sample(jax.random.fold_in(rng, i), b))
            try:
                x.copy_to_host_async()
            except AttributeError:
                pass
            pending.append((x, take))
            start += take

        def fetch():
            outs = [np.asarray(x)[:take] for x, take in pending]
            return outs[0] if len(outs) == 1 else np.concatenate(outs)

        return fetch

    def animate(self, rng: jax.Array, num_frames: int = 50, fps: int = 10,
                label=None) -> bytes:
        """GIF bytes of one sampling trajectory — the serving form of
        create_diffusion_animation for v4/v5 (reference v4:225-234:
        sample_with_intermediates captures frames of one reverse run)."""
        import numpy as np

        from flowerdiff.viz.animation import encode_gif

        sched = self.sched
        _, traj = self.sampler.sample_with_trajectory(rng, 1)
        traj = np.asarray(traj)
        step_interval = max(1, sched.n_steps // num_frames)
        capture = sorted(set(range(0, sched.n_steps, step_interval)) | {0})
        # trajectory index i holds the state after the step at t=n_steps-1-i
        frames = [
            np.uint8(255 * np.clip(traj[sched.n_steps - 1 - t][0], 0, 1))
            for t in sorted(capture, reverse=True)
        ]
        return encode_gif(frames, fps)

    def sample_images(self, n: int, rng: jax.Array):
        """n images of shape (n, img_size, img_size, 3) in [0, 1] (clipped
        like the reference's display path, v4:282), as a host np.ndarray.
        The clip (and uint8 quantization when enabled) runs ON DEVICE; tail
        slicing/concat stay host-side so only bucket-shaped programs reach
        the device (same rationale as SamplingService.sample_async)."""
        import numpy as np

        return self.sample_async(np.zeros((n,), np.int32), rng)()


def service_from_run(
    results_dir: str,
    version: str = "v1",
    synthetic_size: int = 1020,
    seed: int = 42,
    tiny: bool = False,
    cond_dropout: Optional[float] = None,
    ema_decay: Optional[float] = None,
    guidance_scale: Optional[float] = None,
    sampler_kind: str = "ancestral",
    ddim_steps: int = 50,
    buckets: Tuple[int, ...] = DEFAULT_BUCKETS,
    quantize_uint8: bool = False,
    decode_bf16: bool = False,
) -> "SamplingService":
    """Build a :class:`SamplingService` from a finished run's results dir.

    Train-if-missing restore through the runner (same path the eval tools
    use): loads the latest diffusion checkpoint + the trained VAE and wires
    latent z-scoring / CFG / EMA exactly as the run trained them. Shared by
    tools/serve.py and tools/bench_serving.py.

    cond_dropout / ema_decay must match the training run (they change the
    param tree); guidance_scale may differ (a sampling-time knob).
    """
    import dataclasses
    import os

    from flowerdiff.configs import get_preset, tiny_preset
    from flowerdiff.runner import PipelineRunner
    from flowerdiff.train.checkpoints import CheckpointManager

    preset = get_preset(version)
    if tiny:
        preset = tiny_preset(preset)
    lat = preset.latent
    assert lat is not None, f"preset {version} has no latent stage"
    if cond_dropout is not None or ema_decay is not None:
        import dataclasses as _dc

        lat = _dc.replace(
            lat,
            cond_dropout=(cond_dropout if cond_dropout is not None
                          else lat.cond_dropout),
            ema_decay=(ema_decay if ema_decay is not None else lat.ema_decay),
        )
    if guidance_scale is not None:
        lat = dataclasses.replace(lat, guidance_scale=guidance_scale)
    preset = dataclasses.replace(preset, latent=lat)

    runner = PipelineRunner(
        preset, results_dir=results_dir, dataset="synthetic",
        seed=seed, synthetic_size=synthetic_size,
    )
    saved = CheckpointManager(
        os.path.join(results_dir, "ckpt_diffusion")).latest_step()
    assert saved, f"no diffusion checkpoint under {results_dir}"
    _, diff = runner.run_latent(total_epochs=saved, final_sweep=False,
                                cadence_viz=False, restore_scope="params")
    vae, vae_params = runner._trained_vae
    return SamplingService(
        diff.model, {"params": diff.sampling_params}, vae, vae_params,
        sched=diff.sched, buckets=tuple(sorted(buckets)),
        latent_stats=diff.latent_stats, clip_x0=diff.cfg.clip_denoised,
        sampler_kind=sampler_kind, ddim_steps=ddim_steps,
        quantize_uint8=quantize_uint8, decode_bf16=decode_bf16,
    )


def pixel_service_from_run(
    results_dir: str,
    version: str = "v4",
    seed: int = 42,
    tiny: bool = False,
    sampler_kind: str = "ancestral",
    ddim_steps: int = 50,
    buckets: Tuple[int, ...] = (4, 16, 64),
    quantize_uint8: bool = False,
) -> "PixelSamplingService":
    """Build a :class:`PixelSamplingService` from a finished v4/v5 run's
    ckpt_pixel checkpoint (counterpart of service_from_run)."""
    import os

    from flowerdiff.configs import get_preset, tiny_preset
    from flowerdiff.train.checkpoints import (
        CheckpointManager,
        state_to_tree,
        tree_into_state,
    )
    from flowerdiff.train.pixel_ddpm import PixelDiffusionTrainer

    preset = get_preset(version)
    if tiny:
        preset = tiny_preset(preset)
    assert preset.pixel is not None, f"preset {version} has no pixel stage"
    trainer = PixelDiffusionTrainer(preset.pixel, jax.random.key(seed))
    ckpt = CheckpointManager(os.path.join(results_dir, "ckpt_pixel"))
    assert ckpt.exists(), f"no ckpt_pixel under {results_dir}"
    restored = ckpt.restore(like=state_to_tree(trainer.state))
    trainer.state = tree_into_state(trainer.state, restored)
    return PixelSamplingService(
        trainer.model, {"params": trainer.state.params}, sched=trainer.sched,
        buckets=tuple(sorted(buckets)), sampler_kind=sampler_kind,
        ddim_steps=ddim_steps, img_size=preset.pixel.img_size,
        quantize_uint8=quantize_uint8,
    )
