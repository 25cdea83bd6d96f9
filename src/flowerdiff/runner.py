"""End-to-end pipeline orchestration (reference layer L8, SURVEY.md §1).

Parity target: main() (v1:1290-1433, v3:1593-1741, v4:258-291) — device/mesh
setup, dataset build, train-if-missing for the VAE then the diffusion model,
epoch-stamped resume, loss-curve PNGs, and the final visualization sweep
(sample grid + denoising paths + GIFs for the first 10 classes).

Differences by design:
  - checkpoints are Orbax with step metadata (directory per model) instead of
    filename-parsed .pt files; `--checkpoint_path` with `...epoch_N` is still
    honored for reference-style resume (train/checkpoints.py).
  - all sampling/visualization device work is batched (viz/*).
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.configs import VersionPreset
from flowerdiff.data import DeviceDataset, synthetic_flowers
from flowerdiff.data.flowers102 import class_names as flowers_class_names
from flowerdiff.data.flowers102 import load_flowers102
from flowerdiff.models.vae import FlowerVAE
from flowerdiff.train.checkpoints import (
    CheckpointManager,
    parse_epoch_from_filename,
    state_to_tree,
    tree_into_state,
    tree_into_vae_gan_state,
    vae_gan_state_to_tree,
)
from flowerdiff.train.latent_ddpm import LatentDiffusionTrainer
from flowerdiff.train.metrics import LossHistory
from flowerdiff.train.pixel_ddpm import PixelDiffusionTrainer
from flowerdiff.train.vae_gan import VAEGANTrainer
from flowerdiff.utils.image import psnr
from flowerdiff import viz
from flowerdiff.viz.grids import generate_pixel_samples_grid
from flowerdiff.viz.animation import create_pixel_diffusion_animation


class _StageClock:
    """Wall-clock attribution for the long pipeline stages. The round-4
    flagship spent ~25 of ~30 end-to-end minutes in the VAE-GAN stage with
    no record of WHERE (BASELINE.md round-5 timing table); every stage now
    prints one `[stage ...]` summary attributing its wall time to dispatch /
    compile / checkpoint-save / viz buckets so regressions are diagnosable
    from the run log alone."""

    def __init__(self, stage: str):
        self.stage = stage
        self.t0 = time.perf_counter()
        self.buckets: dict[str, float] = {}
        self.first_dispatch: Optional[float] = None

    @contextlib.contextmanager
    def track(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t
            self.buckets[name] = self.buckets.get(name, 0.0) + dt
            if name == "dispatch" and self.first_dispatch is None:
                self.first_dispatch = dt

    def done(self) -> float:
        total = time.perf_counter() - self.t0
        parts = ", ".join(
            f"{k} {v:.1f}s" for k, v in
            sorted(self.buckets.items(), key=lambda kv: -kv[1])
        )
        other = total - sum(self.buckets.values())
        first = (f" (first dispatch incl. compile {self.first_dispatch:.1f}s)"
                 if self.first_dispatch is not None else "")
        print(f"[stage {self.stage}] {total:.1f}s total: {parts}, "
              f"other {other:.1f}s{first}", flush=True)
        return total


class _CondAdapter:
    """Presents a (classes,)-conditioned interface over a v3 dual-condition
    sampler by appending a default color label (the class-only viz calls of
    the v1-parity sweep)."""

    def __init__(self, sampler, default_color: int = 0):
        self._sampler = sampler
        self._color = default_color
        self.sched = sampler.sched
        self.event_shape = sampler.event_shape
        self.latent_dim = sampler.latent_dim

    def sample(self, rng, batch, classes):
        colors = jnp.full((batch,), self._color, jnp.int32)
        return self._sampler.sample(rng, batch, classes, colors)

    def masked_denoise(self, rng, x_init, t_start, classes):
        colors = jnp.full((x_init.shape[0],), self._color, jnp.int32)
        return self._sampler.masked_denoise(rng, x_init, t_start, classes, colors)


class PipelineRunner:
    def __init__(
        self,
        preset: VersionPreset,
        results_dir: Optional[str] = None,
        data_root: str = "./data",
        dataset: str = "auto",  # auto | flowers102 | synthetic
        seed: int = 42,
        mesh=None,
        synthetic_size: int = 512,
        fused_epochs: bool = True,
    ):
        self.preset = preset
        self.seed = seed
        self.mesh = mesh
        # One device dispatch per epoch-chunk (train/fused.py) instead of one
        # per batch. Capped so a reference-width VAE-GAN chunk stays ~10-20s.
        self.fused_epochs = fused_epochs
        self.max_epochs_per_dispatch = 50
        is_pixel = preset.pixel is not None
        self.results_dir = results_dir or (
            "./oxford_flowers_image_diffusion" if is_pixel
            else "./oxford_flowers_conditional_improved"  # v1:1295
        )
        os.makedirs(self.results_dir, exist_ok=True)
        self.class_names = flowers_class_names()

        images, labels = self._load_data(data_root, dataset, synthetic_size)
        colors = None
        if preset.latent is not None and preset.latent.num_colors is not None:
            from flowerdiff.data.color_labels import extract_color_labels_cached
            from flowerdiff.viz.color_viz import create_flower_color_visualization

            colors, _names = extract_color_labels_cached(
                images, cache_path=os.path.join(self.results_dir, "color_labels.npz")
            )
            # v3:1603-1605: label-inspection grid written at startup.
            create_flower_color_visualization(
                images[:100], labels[:100], self.class_names,
                num_samples=min(20, len(images)),
                save_path=os.path.join(self.results_dir, "color_visualization.png"),
                color_labels=colors[:100],
            )
        self.train_ds = DeviceDataset(
            images, labels, colors=colors, mesh=mesh,
            augment=True,
            max_rotation_deg=0.0 if is_pixel else 10.0,  # v4:17-21 has no rotation
            jitter=0.0 if is_pixel else 0.2,
        )
        # The reference visualizes/evaluates from the TEST split (v1:663,796).
        # Real data: the actual Flowers102 test split. Synthetic: a
        # disjoint-seed held-out set (VERDICT r2 item 7) — recon PSNR, t-SNE,
        # MMD and the quality report all read from here, never train data.
        eval_images, eval_labels = self._load_eval_data(
            data_root, dataset, synthetic_size
        )
        eval_ds = DeviceDataset(eval_images, eval_labels, mesh=mesh,
                                augment=False)
        self.test_images, self.test_labels = eval_ds.full()[:2]
        self.train_images_eval = self.train_ds.full()[0]  # train-split row

    @staticmethod
    def _best_as_tree(best_tree, best_state):
        """Checkpoint tree for the best snapshot: the loop path holds an
        explicit tree copy; the fused path's sentinel points at the
        device-carried best VAEGANState."""
        return (vae_gan_state_to_tree(best_state) if best_tree is True
                else best_tree)

    def _chunk_size(self, epoch: int, total: int,
                    *cadences: Optional[int], cap: Optional[int] = None) -> int:
        """Epochs for the next fused dispatch: never crosses a viz/checkpoint
        cadence boundary (so cadence artifacts still appear at the same
        absolute epochs as the per-step loop) and never exceeds the cap."""
        n = min(cap or self.max_epochs_per_dispatch, total - epoch)
        for cadence in cadences:
            if cadence:
                n = min(n, cadence - (epoch % cadence))
        return max(1, n)

    def _load_data(self, data_root, dataset, synthetic_size):
        if dataset in ("auto", "flowers102"):
            try:
                return load_flowers102(data_root, "train", self.preset.img_size)
            except FileNotFoundError:
                if dataset == "flowers102":
                    raise
                print("Flowers102 not found — using the synthetic dataset.")
        return synthetic_flowers(
            synthetic_size, 102, self.preset.img_size, seed=self.seed
        )

    def _load_eval_data(self, data_root, dataset, synthetic_size):
        """Held-out evaluation split: the real TEST split (what the
        reference evaluates from, v1:663,796) or a disjoint-seed synthetic
        set — synthetic_flowers draws per-image petal phase/jitter/noise
        from the seed, so seed+1000 yields images the model never saw."""
        if dataset in ("auto", "flowers102"):
            try:
                return load_flowers102(data_root, "test", self.preset.img_size)
            except FileNotFoundError:
                if dataset == "flowers102":
                    raise
        return synthetic_flowers(
            max(128, synthetic_size // 2), 102, self.preset.img_size,
            seed=self.seed + 1000,
        )

    # ------------------------------------------------------------------ #
    # Latent pipeline (v1/v2/v3)
    # ------------------------------------------------------------------ #

    def run_latent(
        self,
        total_epochs: int,
        vae_epochs: Optional[int] = None,
        checkpoint_path: Optional[str] = None,
        batch_size: Optional[int] = None,
        final_sweep: bool = True,
        cadence_viz: bool = True,
        checkpoint_every: Optional[int] = None,
        restore_scope: str = "full",
    ):
        """restore_scope: "full" uploads the complete checkpointed state
        (exact resume — required to continue training); "params" uploads
        only the sampling-relevant subtrees (VAE generator params, diffusion
        params + EMA), leaving optimizer moments at init. Sampling-only
        consumers (serving, eval tools) use "params": every uploaded byte
        crosses the tunnel, and the full VAE-GAN state is ~3x its generator
        params. Single-device only (mesh runs re-apply shardings on the
        full-restore path)."""
        preset = self.preset
        if self.mesh is not None and getattr(self.mesh, "size", 1) > 1:
            restore_scope = "full"
        assert preset.vae is not None and preset.latent is not None
        batch_size = batch_size or preset.batch_size
        steps_per_epoch = max(1, self.train_ds.n // batch_size)
        vae_epochs = vae_epochs if vae_epochs is not None else preset.vae_epochs

        rng = jax.random.key(self.seed)
        vae_rng, diff_rng = jax.random.split(rng)

        # ---- VAE-GAN: train-if-missing (v1:1304-1326). ----
        import dataclasses

        vae_cfg = dataclasses.replace(
            preset.vae, total_steps=max(1, vae_epochs * steps_per_epoch)
        )
        trainer = VAEGANTrainer(vae_cfg, vae_rng, img_size=preset.img_size)
        vae_ckpt = CheckpointManager(os.path.join(self.results_dir, "ckpt_vae"))
        history = LossHistory()
        if vae_ckpt.exists():
            print(f"Loading existing autoencoder from {vae_ckpt.directory}")
            like_tree = vae_gan_state_to_tree(trainer.state)
            if restore_scope == "params":
                host = vae_ckpt.restore_host(like=like_tree)
                gen_params = jax.device_put(host["gen"]["params"])
                jax.block_until_ready(gen_params)
                trainer.state = trainer.state.replace(
                    gen=trainer.state.gen.replace(params=gen_params)
                )
            else:
                restored = vae_ckpt.restore(like=like_tree)
                trainer.state = tree_into_vae_gan_state(trainer.state, restored)
        else:
            print("No existing autoencoder found. Training a new one...")
            clock = _StageClock("vae_gan")
            best = float("inf")
            best_tree = None
            best_epoch = 0
            saved_best_epoch = None
            # Fused path: the best-state carry (reference per-epoch policy,
            # v1:1177-1182) is tracked inside the dispatch and donated each
            # chunk; seed it with a COPY of the initial state (arg 0 is the
            # live state and is donated separately).
            best_state = (
                jax.tree.map(jnp.copy, trainer.state)
                if self.fused_epochs else None
            )
            ep_rng = np.random.default_rng(self.seed)
            # Crash-recovery save cadence: --checkpoint_every when given,
            # else the viz cadence (reference-shaped default). A full-state
            # save is a ~1 GB D2H over the tunnel (~30-60 s); at the default
            # 300-epoch cadence that is 4 saves across the 1200-epoch stage,
            # and --checkpoint_every lets production runs pay fewer.
            save_every = checkpoint_every or preset.vae_visualize_every
            epoch = 0
            while epoch < vae_epochs:
                if self.fused_epochs:
                    n = self._chunk_size(epoch, vae_epochs,
                                         preset.vae_visualize_every, save_every)
                    with clock.track("dispatch"):
                        chunk, (best, maybe_epoch, best_state) = \
                            trainer.run_epochs_fused(
                                self.train_ds, epoch, vae_epochs, n,
                                jax.random.fold_in(vae_rng, epoch), batch_size,
                                mesh=self.mesh, best=(best, best_state),
                            )
                    if maybe_epoch is not None:
                        best_epoch = maybe_epoch
                        best_tree = True  # sentinel: best_state holds it
                else:
                    batches = self.train_ds.batches(ep_rng, batch_size)
                    if self.preset.latent.num_colors is not None:
                        batches = ((img, lab) for img, lab, _col in batches)
                    chunk = [trainer.run_epoch(
                        batches, epoch, vae_epochs,
                        jax.random.fold_in(vae_rng, epoch),
                    )]
                for off, metrics in enumerate(chunk):
                    history.append(metrics)
                    print(
                        f"Epoch {epoch + off + 1}/{vae_epochs}, "
                        + ", ".join(f"{k}: {v:.6f}" for k, v in sorted(metrics.items()))
                    )
                if not self.fused_epochs:
                    totals = [m["total"] for m in chunk]
                    if min(totals) < best:
                        # Best-checkpoint policy (v1:1177-1182). The best
                        # state is held on device and persisted at the viz
                        # cadence + at the end — a per-epoch 69M-param disk
                        # write would dominate the ~1.6ms train steps.
                        # COPIES, not references: the jitted step donates its
                        # input buffers, so references into a past state get
                        # deleted by later steps. FULL state (gen+disc incl.
                        # optimizer moments + centers) so resume is exact
                        # (reference saves G+D dicts, v1:1188-1191). The
                        # fused path tracks the same per-epoch policy INSIDE
                        # the dispatch (train/fused.py track_best).
                        best = min(totals)
                        best_epoch = epoch + len(chunk) - 1
                        best_tree = jax.tree.map(
                            jnp.copy, vae_gan_state_to_tree(trainer.state)
                        )
                epoch += len(chunk)
                if (epoch % save_every == 0 or epoch == vae_epochs) \
                        and best_tree is not None:
                    with clock.track("ckpt_save"):
                        vae_ckpt.save(best_epoch, self._best_as_tree(
                            best_tree, best_state))
                    saved_best_epoch = best_epoch
                if (epoch % preset.vae_visualize_every == 0
                        or epoch == vae_epochs) and cadence_viz:
                    with clock.track("viz"):
                        self._vae_viz(trainer, epoch)
            # The loop's final iteration (epoch == vae_epochs) already saved
            # the best state — don't pay the ~1 GB tunnel D2H twice.
            if best_tree is not None and saved_best_epoch != best_epoch:
                with clock.track("ckpt_save"):
                    vae_ckpt.save(best_epoch,
                                  self._best_as_tree(best_tree, best_state))
            with clock.track("ckpt_save"):
                vae_ckpt.save(vae_epochs, vae_gan_state_to_tree(trainer.state))
            history.save_jsonl(os.path.join(self.results_dir, "vae_history.jsonl"))
            viz.plot_loss_curves(
                history.history,
                os.path.join(self.results_dir, "autoencoder_losses.png"),
            )
            clock.done()

        vae, vae_params = trainer.vae, trainer.state.gen.params
        self._trained_vae = (vae, vae_params)
        setup_clock = _StageClock("inter_stage_setup")
        decode_fn, encode_mu_fn, encode_decode_fn = self._vae_fns(vae, vae_params)
        if restore_scope != "params":  # skip the 2-eval PSNR in sampling-only loads
            with setup_clock.track("recon_psnr"):
                print(f"VAE recon PSNR: {self._recon_psnr(encode_decode_fn):.2f} dB "
                      f"(held-out) / "
                      f"{self._recon_psnr(encode_decode_fn, images=self.train_images_eval):.2f} dB (train)")

        # ---- Latent diffusion: resume + train (v1:1340-1405). ----
        lat_cfg = dataclasses.replace(preset.latent, steps_per_epoch=steps_per_epoch)
        latent_stats = None
        if lat_cfg.normalize_latents:
            with setup_clock.track("latent_stats"):
                latent_stats = self._compute_latent_stats(vae, vae_params)
        diff = LatentDiffusionTrainer(lat_cfg, vae, diff_rng,
                                      latent_stats=latent_stats)
        setup_clock.done()
        diff_ckpt = CheckpointManager(os.path.join(self.results_dir, "ckpt_diffusion"))
        start_epoch = 0
        if checkpoint_path:
            epoch = parse_epoch_from_filename(checkpoint_path)
            if epoch is not None and diff_ckpt.exists():
                start_epoch = epoch
                restored = diff_ckpt.restore(epoch, like=state_to_tree(diff.state))
                diff.state = tree_into_state(diff.state, restored)
                print(f"Continuing training from epoch {start_epoch}")
        elif diff_ckpt.exists():
            start_epoch = diff_ckpt.latest_step()
            if restore_scope == "params" and start_epoch >= total_epochs:
                host = diff_ckpt.restore_host(like=state_to_tree(diff.state))
                ups = jax.device_put({
                    k: host[k] for k in ("params", "ema_params") if k in host
                })
                jax.block_until_ready(ups)
                diff.state = diff.state.replace(**ups)
            else:
                restored = diff_ckpt.restore(like=state_to_tree(diff.state))
                diff.state = tree_into_state(diff.state, restored)
            print(f"Loaded diffusion model at epoch {start_epoch}")

        # The reference checkpoints at every visualization cadence
        # (v1:1282); `checkpoint_every` decouples the two for long fused
        # runs, where a full-state Orbax save every 50 epochs would
        # dominate wall time (30k epochs = 600 saves).
        ckpt_every = checkpoint_every or preset.diffusion_visualize_every
        viz_cadence = preset.diffusion_visualize_every if cadence_viz else None
        diff_losses = []
        ep_rng = np.random.default_rng(self.seed + 1)
        epoch = start_epoch
        clock = _StageClock("latent_ddpm")
        saved_at = None
        while epoch < total_epochs:
            if self.fused_epochs:
                # Latent-cache runs keep the chip busy across pool-refresh
                # windows only if the host enqueues them without syncing
                # (run_epochs_cached defers its loss fetch), so give that
                # path much larger chunks — the per-chunk cost left is one
                # key_data fetch and the per-epoch print lines.
                cached = getattr(diff.cfg, "latent_cache", 0) > 0
                n = self._chunk_size(
                    epoch, total_epochs, viz_cadence, ckpt_every,
                    cap=1000 if cached else None,
                )
                with clock.track("dispatch"):
                    chunk = diff.run_epochs_fused(
                        self.train_ds, n, vae_params,
                        jax.random.fold_in(diff_rng, epoch), batch_size,
                        mesh=self.mesh,
                    )
            else:
                batches = self.train_ds.batches(ep_rng, batch_size)
                chunk = [diff.run_epoch(
                    batches, vae_params, jax.random.fold_in(diff_rng, epoch)
                )]
            for off, loss in enumerate(chunk):
                diff_losses.append(loss)
                print(f"Epoch {epoch + off + 1}/{total_epochs}, Average Loss: {loss:.6f}")
            epoch += len(chunk)
            if cadence_viz and epoch % preset.diffusion_visualize_every == 0:
                with clock.track("viz"):
                    self._diffusion_viz(diff, decode_fn, encode_mu_fn, epoch)
            if epoch % ckpt_every == 0 or epoch == total_epochs:
                with clock.track("ckpt_save"):
                    diff_ckpt.save(epoch, state_to_tree(diff.state))
                saved_at = epoch
        if diff_losses:
            # Skip the redundant end-of-stage save when the loop's last
            # iteration already wrote step `total_epochs`.
            if saved_at != total_epochs:
                with clock.track("ckpt_save"):
                    diff_ckpt.save(total_epochs, state_to_tree(diff.state))
            viz.plot_single_loss_curve(
                diff_losses,
                os.path.join(
                    self.results_dir,
                    "diffusion_loss_continued.png" if start_epoch else "diffusion_loss.png",
                ),
                start_epoch=start_epoch or None,
            )

        clock.done()

        # ---- Final sweep (v1:1406-1429). ----
        if final_sweep:
            sweep_clock = _StageClock("final_sweep")
            self._final_sweep(diff, decode_fn, encode_mu_fn,
                              clock=sweep_clock)
            sweep_clock.done()
        return trainer, diff

    # ------------------------------------------------------------------ #
    # Pixel pipeline (v4/v5)
    # ------------------------------------------------------------------ #

    def run_pixel(self, epochs: Optional[int] = None,
                  batch_size: Optional[int] = None, cadence_viz: bool = True):
        preset = self.preset
        assert preset.pixel is not None
        epochs = epochs if epochs is not None else preset.pixel_epochs
        batch_size = batch_size or preset.batch_size
        trainer = PixelDiffusionTrainer(preset.pixel, jax.random.key(self.seed))
        ckpt = CheckpointManager(os.path.join(self.results_dir, "ckpt_pixel"))
        if ckpt.exists():
            restored = ckpt.restore(like=state_to_tree(trainer.state))
            trainer.state = tree_into_state(trainer.state, restored)
            print(f"Loaded pixel diffusion at epoch {ckpt.latest_step()}")
        else:
            ep_rng = np.random.default_rng(self.seed)
            rng = jax.random.key(self.seed + 2)
            epoch = 0
            while epoch < epochs:
                if self.fused_epochs:
                    n = self._chunk_size(epoch, epochs, preset.pixel_visualize_every)
                    chunk = trainer.run_epochs_fused(
                        self.train_ds, n, jax.random.fold_in(rng, epoch),
                        batch_size, mesh=self.mesh,
                    )
                else:
                    chunk = [trainer.run_epoch(
                        self.train_ds.batches(ep_rng, batch_size),
                        jax.random.fold_in(rng, epoch),
                    )]
                for off, loss in enumerate(chunk):
                    print(f"Diffusion Epoch {epoch + off + 1}/{epochs}, Loss: {loss:.4f}")
                epoch += len(chunk)
                if (
                    cadence_viz
                    and preset.pixel_visualize_every
                    and epoch % preset.pixel_visualize_every == 0
                ):  # v5:268-273 (0-based epoch in the artifact names)
                    sampler = trainer.sampler()
                    generate_pixel_samples_grid(
                        sampler,
                        save_path=os.path.join(
                            self.results_dir, f"samples_grid_epoch_{epoch - 1}.png"
                        ),
                    )
                    create_pixel_diffusion_animation(
                        sampler,
                        save_path=os.path.join(
                            self.results_dir, f"diffusion_animation_epoch_{epoch - 1}.gif"
                        ),
                    )
            ckpt.save(epochs, state_to_tree(trainer.state))

        # Final artifacts (v4:272-286).
        sampler = trainer.sampler()
        generate_pixel_samples_grid(
            sampler,
            save_path=os.path.join(self.results_dir, "samples_grid.png"),
        )
        create_pixel_diffusion_animation(
            sampler,
            save_path=os.path.join(self.results_dir, "diffusion_animation.gif"),
        )
        self._single_pixel_sample(sampler)
        return trainer

    def _single_pixel_sample(self, sampler):
        """One generated image, `generated_pixel_diffusion.png` (v4:278-288)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        img = np.asarray(sampler.sample(jax.random.key(self.seed + 9), 1))[0]
        plt.figure(figsize=(4, 4))
        plt.imshow(np.clip(img, 0, 1))
        plt.axis("off")
        plt.title("Generated Image")
        path = os.path.join(self.results_dir, "generated_pixel_diffusion.png")
        plt.savefig(path, bbox_inches="tight")
        plt.close()
        print(f"Generated image saved as {path}")

    # ------------------------------------------------------------------ #
    # Helpers
    # ------------------------------------------------------------------ #

    def _compute_latent_stats(self, vae: FlowerVAE, vae_params):
        """Per-dim mean/std of the trained VAE's sampled posterior over the
        train set (deterministic: fixed reparam key), for z-scored DDPM
        training (LatentDiffusionConfig.normalize_latents). Recomputed on
        resume — same encoder, same key, same stats — and also saved to
        latent_stats.npz for serving/inspection."""

        @jax.jit
        def enc(p, x, key):
            mu, logvar = vae.apply(
                {"params": p}, x, method=FlowerVAE.encode_with_params
            )
            return FlowerVAE.reparameterize(key, mu, logvar)

        imgs, _ = self.train_ds.full()[:2]
        z = enc(vae_params, imgs, jax.random.key(self.seed + 3))
        mean = jnp.mean(z, axis=0)
        std = jnp.maximum(jnp.std(z, axis=0), 1e-3)
        np.savez(os.path.join(self.results_dir, "latent_stats.npz"),
                 mean=np.asarray(mean), std=np.asarray(std))
        print(f"latent stats: |mean| {float(jnp.abs(mean).mean()):.3f}, "
              f"std range [{float(std.min()):.3f}, {float(std.max()):.3f}]")
        return mean, std

    def _quality_report(self, sampler, encode_mu_fn):
        """Classifier accuracy on generated samples, latent MMD, and the
        image-space perceptual Fréchet distance (FID analogue in the
        perceptual backbone's feature space), appended to
        <results_dir>/sample_quality.jsonl (utils/quality.py)."""
        import json

        from flowerdiff.models.vgg import (
            IMAGENET_MEAN, IMAGENET_STD, VGGFeatures, load_vgg_params,
        )
        from flowerdiff.utils.quality import sample_quality_report

        vae, vae_params = self._trained_vae
        classify_jit = jax.jit(
            lambda p, z: vae.apply({"params": p}, z, method=FlowerVAE.classify)
        )
        decode_jit = jax.jit(
            lambda p, z: vae.apply({"params": p}, z, method=FlowerVAE.decode)
        )
        vgg_model = VGGFeatures()
        vgg_params, _ = load_vgg_params()

        @jax.jit
        def pooled_feats(p, x):
            f = vgg_model.apply(
                p, (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            )
            return jnp.mean(f, axis=(1, 2))  # (N, 256) relu3_3 global pool

        report = sample_quality_report(
            sampler,
            lambda z: classify_jit(vae_params, z),
            encode_mu_fn,
            self.test_images,  # held-out split (reference: test, v1:663)
            jax.random.key(self.seed + 7),
            num_classes=len(self.class_names),
            extra_splits={"train": self.train_images_eval},
            decode_fn=lambda z: decode_jit(vae_params, z),
            feature_fn=lambda x: pooled_feats(vgg_params, x),
            # FD comparability stamp (quality.check_fd_comparable): the
            # backbone hash + this run's identity travel with the number.
            feature_params=vgg_params,
            run_id=os.path.abspath(self.results_dir),
        )
        print(
            "Sample quality: classifier acc "
            f"{report['classifier_accuracy']:.3f} (chance "
            f"{report['chance_accuracy']:.3f}), latent MMD heldout "
            f"{report['latent_mmd']:.4f} / train "
            f"{report['latent_mmd_train']:.4f}, perceptual FD heldout "
            f"{report['perceptual_fd']:.1f} / train "
            f"{report['perceptual_fd_train']:.1f}"
        )

        def _safe(d):
            return {k: (v if not isinstance(v, float) or np.isfinite(v)
                        else str(v)) for k, v in d.items()}

        # two rows, one per evaluation split (one shared generation pass)
        shared = {k: report[k] for k in
                  ("classifier_accuracy", "chance_accuracy", "n_generated")}
        shared.update({k: report[k] for k in ("fd_backbone", "fd_run_id")
                       if k in report})
        rows = [
            {"split": "heldout", **shared, "latent_mmd": report["latent_mmd"],
             "perceptual_fd": report.get("perceptual_fd"),
             "n_real": report["n_real"]},
            {"split": "train", **shared,
             "latent_mmd": report["latent_mmd_train"],
             "perceptual_fd": report.get("perceptual_fd_train")},
        ]
        with open(os.path.join(self.results_dir, "sample_quality.jsonl"), "a") as f:
            for row in rows:
                f.write(json.dumps(_safe(row)) + "\n")
        return report

    def _vae_fns(self, vae: FlowerVAE, params):
        # Params are jit ARGUMENTS (python-side partial application): closing
        # over a 69M-param tree bakes it into the executable as constants —
        # ~30x slower calls and minutes of extra compile time (measured).
        decode_jit = jax.jit(
            lambda p, z: vae.apply({"params": p}, z, method=FlowerVAE.decode)
        )

        @jax.jit
        def encode_mu_jit(p, x):
            mu, _ = vae.apply(
                {"params": p}, x, method=FlowerVAE.encode_with_params
            )
            return mu

        @jax.jit
        def encode_decode_jit(p, x, rng):
            mu, logvar = vae.apply(
                {"params": p}, x, method=FlowerVAE.encode_with_params
            )
            z = FlowerVAE.reparameterize(rng, mu, logvar)
            return vae.apply({"params": p}, z, method=FlowerVAE.decode)

        return (
            lambda z: decode_jit(params, z),
            lambda x: encode_mu_jit(params, x),
            lambda x, rng: encode_decode_jit(params, x, rng),
        )

    def _recon_psnr(self, encode_decode_fn, n: int = 64, images=None) -> float:
        imgs = (self.test_images if images is None else images)[:n]
        recon = encode_decode_fn(imgs, jax.random.key(0))
        return float(psnr(imgs, recon))

    def _vae_viz(self, trainer: VAEGANTrainer, epoch: int):
        _, encode_mu_fn, encode_decode_fn = self._vae_fns(
            trainer.vae, trainer.state.gen.params
        )
        viz.visualize_reconstructions(
            encode_decode_fn, self.test_images, np.asarray(self.test_labels),
            epoch, self.class_names, self.results_dir,
        )
        viz.visualize_latent_space(
            encode_mu_fn, self.test_images, np.asarray(self.test_labels),
            epoch, self.class_names, self.results_dir, max_points=2000,
        )

    def _viz_sampler(self, diff):
        """The class-only viz calls need a (classes,)-conditioned sampler;
        v3's dual-condition model gets a default color via _CondAdapter."""
        sampler = diff.sampler()
        if self.preset.latent.num_colors is not None:
            return sampler, _CondAdapter(sampler)
        return sampler, sampler

    def _diffusion_viz(self, diff, decode_fn, encode_mu_fn, epoch: int):
        """Per-cadence artifacts: first 2 classes for v1/v2 (v1:1273-1281);
        classes [4, 53, 68] plus purple/yellow color grids for v3
        (v3:1572-1583)."""
        raw_sampler, sampler = self._viz_sampler(diff)
        is_v3 = self.preset.latent.num_colors is not None
        if is_v3:
            from flowerdiff.viz.color_viz import generate_class_color_samples

            class_list = [i for i in (4, 53, 68) if i < len(self.class_names)]
            for class_idx in class_list:
                name = self.class_names[class_idx]
                for color in ("purple", "yellow"):
                    generate_class_color_samples(
                        raw_sampler, decode_fn, class_idx, color,
                        self.class_names,
                        save_path=os.path.join(
                            self.results_dir,
                            f"sample_class_color_{name}_{color}_epoch_{epoch}.png",
                        ),
                    )
        else:
            class_list = range(min(len(self.class_names), 2))
        for class_idx in class_list:
            name = self.class_names[class_idx]
            viz.create_diffusion_animation(
                sampler, decode_fn, class_idx, self.class_names,
                save_path=os.path.join(
                    self.results_dir,
                    f"diffusion_animation_class_{name}_epoch_{epoch}.gif",
                ),
            )
            viz.generate_class_samples(
                sampler, decode_fn, class_idx, self.class_names,
                save_path=os.path.join(
                    self.results_dir, f"sample_class_{name}_epoch_{epoch}.png"
                ),
            )
            viz.visualize_denoising_steps(
                encode_mu_fn, decode_fn, sampler,
                self.test_images, np.asarray(self.test_labels),
                class_idx, self.class_names,
                save_path=os.path.join(
                    self.results_dir, f"denoising_path_{name}_epoch_{epoch}.png"
                ),
            )

    def _final_sweep(self, diff, decode_fn, encode_mu_fn, clock=None):
        """Sample grid + 10 denoising paths + 10 GIFs (v1:1406-1429), plus
        the quantitative quality report (beyond-reference; utils/quality.py)."""
        clock = clock or _StageClock("final_sweep(detached)")
        _raw, sampler = self._viz_sampler(diff)
        with clock.track("quality_report"):
            self._quality_report(sampler, encode_mu_fn)
        with clock.track("samples_grid"):
            viz.generate_samples_grid(
                sampler, decode_fn, self.class_names,
                save_dir=self.results_dir,
            )
        for class_idx in range(min(len(self.class_names), 10)):
            name = self.class_names[class_idx]
            with clock.track("denoising_paths"):
                viz.visualize_denoising_steps(
                    encode_mu_fn, decode_fn, sampler,
                    self.test_images, np.asarray(self.test_labels),
                    class_idx, self.class_names,
                    save_path=os.path.join(
                        self.results_dir, f"denoising_path_{name}_final.png"
                    ),
                )
            with clock.track("animations"):
                viz.create_diffusion_animation(
                    sampler, decode_fn, class_idx, self.class_names, fps=15,
                    save_path=os.path.join(
                        self.results_dir,
                        f"diffusion_animation_{name}_final.gif"
                    ),
                )
