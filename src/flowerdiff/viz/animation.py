"""Diffusion GIF animations.

Parity target: create_diffusion_animation (v1:884-960; v4:225-234): fully
denoise one latent (seeded), then re-noise the clean latent to each t of a
forward+backward ping-pong timestep list via q_sample with one FIXED noise
draw (v1:930-934), decode each frame, title with % noise, GIF via imageio.

TPU-first: the reference re-noises and decodes frame-by-frame with a
matplotlib round-trip per frame through temp PNG files. Here:
  - the clean latent comes from one jitted scan;
  - ALL frames' re-noised latents are one vectorized q_sample (each frame is
    an independent elementwise mix of the same clean latent and the same
    fixed eps);
  - all frames decode in ONE batched decoder call;
  - frames render straight into in-memory RGB buffers and encode with one
    shared-palette PIL pass (no temp files to clean up, v1:943-958; see
    _render_frame/_write_gif for the measured host-cost rationale).

The pixel-space variant (v4:225-234) instead captures intermediates of one
sampling run: that is `sample_with_trajectory` + host frame gather.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.diffusion import q_sample
from flowerdiff.diffusion.api import DiffusionSampler


def _pingpong_timesteps(n_steps: int, num_frames: int) -> list[int]:
    """Forward list 0..n-1 strided, then backward over the interior
    (v1:906-918, reverse=False default)."""
    if num_frames >= n_steps:
        timesteps = list(range(n_steps))
    else:
        step_size = n_steps // num_frames
        timesteps = list(range(0, n_steps, step_size))
        if timesteps[-1] != n_steps - 1:
            timesteps.append(n_steps - 1)
    timesteps = sorted(timesteps)
    return timesteps + sorted(timesteps[1:-1], reverse=True)


def encode_gif(frames, fps: int) -> bytes:
    """GIF-encode rendered frames with ONE shared adaptive palette (built
    from the first, middle, and last frames stacked) instead of imageio's
    per-frame quantization — measured 2 s vs 30 s for 96 noise-heavy
    frames; output plays identically. Returns the encoded bytes (the
    serving layer streams them; `_write_gif` puts them on disk)."""
    import io

    from PIL import Image

    ims = [Image.fromarray(np.asarray(f)) for f in frames]
    probe = np.concatenate(
        [np.asarray(ims[0]), np.asarray(ims[len(ims) // 2]),
         np.asarray(ims[-1])], axis=0,
    )
    pal = Image.fromarray(probe).quantize(colors=255, method=Image.MEDIANCUT)
    qs = [im.quantize(palette=pal, dither=Image.FLOYDSTEINBERG) for im in ims]
    buf = io.BytesIO()
    qs[0].save(buf, format="GIF", save_all=True, append_images=qs[1:],
               duration=int(1000.0 / fps), loop=0)
    return buf.getvalue()


def _write_gif(frames, save_path: str, fps: int) -> None:
    data = encode_gif(frames, fps)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    with open(save_path, "wb") as f:
        f.write(data)


def _render_frame(img: np.ndarray, title: str, scale: int = 5,
                  title_h: int = 28) -> np.ndarray:
    """One GIF frame: nearest-upscaled image under a white title bar.

    Rendered with PIL instead of a matplotlib figure round-trip: measured
    0.15 ms/frame vs 60 ms (the per-frame savefig->PNG->imread made GIF
    assembly the single largest host cost of a reference-schedule run —
    ~8 min of a 41-min run). Same semantic content as the reference's
    matplotlib frames (image + class/noise-level title, v1:938-941); exact
    margins/typography differ.
    """
    from PIL import Image, ImageDraw

    h, w = img.shape[0], img.shape[1]
    arr = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    im = Image.fromarray(arr).resize((w * scale, h * scale), Image.NEAREST)
    canvas = Image.new("RGB", (w * scale, h * scale + title_h), "white")
    canvas.paste(im, (0, title_h))
    draw = ImageDraw.Draw(canvas)
    tw = draw.textlength(title)
    draw.text((max(0, (w * scale - tw) // 2), title_h // 2 - 6), title,
              fill="black")
    return np.asarray(canvas)


def create_diffusion_animation(
    sampler: DiffusionSampler,
    decode_fn,
    class_idx,
    class_names: Sequence[str],
    num_frames: int = 50,
    seed: int = 42,
    save_path: Optional[str] = None,
    fps: int = 10,
    reverse: bool = False,
    extra_cond: Optional[jax.Array] = None,
) -> str:
    if isinstance(class_idx, str):
        class_idx = list(class_names).index(class_idx)
    if save_path is None:
        os.makedirs("./results", exist_ok=True)
        save_path = f"./results/diffusion_animation_{class_names[class_idx]}.gif"

    sched = sampler.sched
    latent_dim = sampler.latent_dim
    key = jax.random.key(seed)
    sample_key, noise_key = jax.random.split(key)
    classes = jnp.array([class_idx], jnp.int32)
    cond = (classes,) if extra_cond is None else (classes, extra_cond)

    # 1. One compiled reverse process to a clean latent (v1:922-926).
    clean = sampler.sample(sample_key, 1, *cond)

    # 2. All frames re-noised in ONE vectorized q_sample with a single fixed
    #    eps (v1:930-934 reseeds to get the same eps every frame).
    timesteps = _pingpong_timesteps(sched.n_steps, num_frames)
    if reverse:
        timesteps = sorted(set(timesteps), reverse=True)
    ts = jnp.asarray(timesteps, jnp.int32)
    eps = jax.random.normal(noise_key, (1, latent_dim))
    frames_latent = q_sample(
        sched,
        jnp.broadcast_to(clean, (len(timesteps), latent_dim)),
        ts,
        jnp.broadcast_to(eps, (len(timesteps), latent_dim)),
    )
    # t == 0 frames show the clean latent itself (v1:930 gates on t > 0).
    frames_latent = jnp.where((ts > 0)[:, None], frames_latent,
                              jnp.broadcast_to(clean, frames_latent.shape))

    # 3. One batched decode for every frame.
    decoded = np.asarray(decode_fn(frames_latent))

    # 4. Host-side GIF assembly (in-memory, no temp files).
    frames = [
        _render_frame(
            decoded[i],
            f"Class: {class_names[class_idx]} "
            f"(t={t}, {t / sched.n_steps * 100:.1f}% noise)",
        )
        for i, t in enumerate(timesteps)
    ]
    _write_gif(frames, save_path, fps)
    return save_path


def create_pixel_diffusion_animation(
    sampler: DiffusionSampler,
    num_frames: int = 50,
    save_path: str = "diffusion_animation.gif",
    fps: int = 10,
    rng: Optional[jax.Array] = None,
) -> str:
    """Pixel-space animation from one trajectory capture (v4:225-234)."""
    rng = jax.random.key(0) if rng is None else rng
    sched = sampler.sched
    _, traj = sampler.sample_with_trajectory(rng, 1)
    step_interval = max(1, sched.n_steps // num_frames)
    capture = sorted(set(range(0, sched.n_steps, step_interval)) | {0})
    # trajectory index i holds the state after the step at t = n_steps-1-i.
    frames = [
        np.uint8(255 * np.clip(np.asarray(traj[sched.n_steps - 1 - t][0]), 0, 1))
        for t in sorted(capture, reverse=True)
    ]
    _write_gif(frames, save_path, fps)
    return save_path
