#!/usr/bin/env python
"""Convert reference PyTorch checkpoints into flowerdiff checkpoints.

A reference user has .pt files from hours of GPU training:
  flower_autoencoder.pt            {'autoencoder': sd, 'discriminator': sd}
                                   (v1/model_train_test.py:1188-1191) or a raw
                                   autoencoder state_dict (v1:1326)
  conditional_diffusion_final.pt   raw ConditionalUNet state_dict (v1:1283)
  diffusion_unet_pixels.pth        raw SimpleUNet state_dict (v4:252/v5:275)

This tool maps them (flowerdiff.utils.torch_import — forward-parity pinned by
tests/test_torch_import.py) into this framework's Orbax checkpoint layout, so
`python main.py --version vN --results_dir OUT` resumes from the imported
weights instead of retraining.  Optimizer moments start fresh (the reference
never saves them).

Usage:
  python tools/import_torch_checkpoint.py --preset v1 --out results_v1 \
      --autoencoder flower_autoencoder.pt \
      --diffusion conditional_diffusion_final.pt

NOTE: reference denoisers are trained on RAW VAE latents; sample them with
`--raw_latents` (our presets default to z-scored latents + x0 thresholding,
which assume a flowerdiff-trained denoiser).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="v1",
                    choices=["v1", "v2", "v3", "v4", "v5"],
                    help="which reference variant the checkpoints came from")
    ap.add_argument("--out", required=True, help="results_dir to write into")
    ap.add_argument("--autoencoder", default=None, help="flower_autoencoder.pt")
    ap.add_argument("--diffusion", default=None,
                    help="conditional_diffusion_*.pt")
    ap.add_argument("--pixel", default=None,
                    help="diffusion_unet_pixels.pth (v4/v5 SimpleUNet)")
    ap.add_argument("--vae_epoch", type=int, default=None,
                    help="epoch to stamp the VAE checkpoint with "
                         "(default: the preset's full schedule -> 'trained')")
    ap.add_argument("--diff_epoch", type=int, default=None,
                    help="epoch stamp for the diffusion checkpoint (default: "
                         "parsed from the filename, else the full schedule)")
    args = ap.parse_args()
    if not args.autoencoder and not args.diffusion and not args.pixel:
        ap.error("nothing to do: pass --autoencoder, --diffusion and/or "
                 "--pixel")

    import jax

    if os.environ.get("FLOWERDIFF_PLATFORM"):
        # the axon TPU plugin pre-sets jax_platforms, overriding JAX_PLATFORMS
        # (and its tunnel init can block for minutes); honor an explicit
        # framework-level platform request, as cli.py does
        jax.config.update("jax_platforms", os.environ["FLOWERDIFF_PLATFORM"])

    from flowerdiff.configs import get_preset
    from flowerdiff.train.checkpoints import (
        CheckpointManager,
        parse_epoch_from_filename,
        state_to_tree,
        vae_gan_state_to_tree,
    )
    from flowerdiff.utils.torch_import import (
        import_autoencoder,
        import_discriminator,
        import_latent_denoiser,
        import_pixel_unet,
        load_torch_file,
    )

    preset = get_preset(args.preset)
    rng = jax.random.PRNGKey(0)
    os.makedirs(args.out, exist_ok=True)

    def report(name, res):
        print(f"  {name}: {len(res.used)} tensors imported, "
              f"{len(res.approximated)} approximated, "
              f"{len(res.skipped)} skipped (dead/unmappable)")
        for k in res.approximated:
            print(f"    ~ approximated: {k} (BatchNorm affine -> GroupNorm)")
        for k in res.skipped:
            print(f"    - skipped: {k}")

    if args.autoencoder:
        from flowerdiff.train.vae_gan import create_vae_gan_state

        print(f"Importing autoencoder from {args.autoencoder}")
        obj = load_torch_file(args.autoencoder)
        if "autoencoder" in obj:  # combined dict (v1:1188-1191)
            ae_sd, d_sd = obj["autoencoder"], obj.get("discriminator")
        else:  # raw autoencoder state_dict (v1:1326)
            ae_sd, d_sd = obj, None
        ae = import_autoencoder(ae_sd)
        report("autoencoder", ae)
        cfg = preset.vae
        if (ae.aux["latent_dim"], ae.aux["num_classes"]) != (
                cfg.latent_dim, cfg.num_classes):
            raise SystemExit(
                f"checkpoint geometry (latent={ae.aux['latent_dim']}, "
                f"classes={ae.aux['num_classes']}) does not match preset "
                f"{args.preset} ({cfg.latent_dim}/{cfg.num_classes})")
        state, _, _ = create_vae_gan_state(rng, cfg,
                                           img_size=preset.img_size)
        gen = state.gen.replace(params=jax.tree.map(
            lambda a: jax.numpy.asarray(a), ae.params))
        disc = state.disc
        if d_sd is not None:
            d_res = import_discriminator(d_sd)
            report("discriminator", d_res)
            disc = disc.replace(params=jax.tree.map(
                lambda a: jax.numpy.asarray(a), d_res.params))
        centers = (jax.numpy.asarray(ae.aux["class_centers"])
                   if ae.aux["class_centers"] is not None else state.centers)
        state = state.replace(gen=gen, disc=disc, centers=centers)
        epoch = args.vae_epoch or preset.vae_epochs
        mgr = CheckpointManager(os.path.join(args.out, "ckpt_vae"))
        mgr.save(epoch, vae_gan_state_to_tree(state))
        print(f"  -> {mgr.directory} @ epoch {epoch}")

    if args.diffusion:
        from flowerdiff.train.latent_ddpm import create_latent_diffusion_state

        print(f"Importing latent denoiser from {args.diffusion}")
        sd = load_torch_file(args.diffusion)
        res = import_latent_denoiser(sd)
        report("denoiser", res)
        lcfg = preset.latent
        detected = (res.aux["hidden_dims"], res.aux["latent_dim"],
                    res.aux["num_classes"], res.aux["num_colors"],
                    res.aux["shared_cond_proj"])
        expected = (tuple(lcfg.hidden_dims), lcfg.latent_dim,
                    lcfg.num_classes, lcfg.num_colors, lcfg.shared_cond_proj)
        if detected != expected:
            raise SystemExit(
                f"checkpoint geometry {detected} does not match preset "
                f"{args.preset} {expected} — pick the matching --preset")
        # imported reference weights were trained on raw latents; record
        # that in the saved config expectation (sampling: --raw_latents)
        lcfg = dataclasses.replace(lcfg, normalize_latents=False,
                                   clip_denoised=None)
        st, _, _ = create_latent_diffusion_state(rng, lcfg)
        params = jax.tree.map(lambda a: jax.numpy.asarray(a), res.params)
        st = st.replace(params=params)
        if getattr(st, "ema_params", None) is not None:
            st = st.replace(ema_params=params)
        epoch = (args.diff_epoch
                 or parse_epoch_from_filename(args.diffusion)
                 or preset.total_epochs)
        mgr = CheckpointManager(os.path.join(args.out, "ckpt_diffusion"))
        mgr.save(epoch, state_to_tree(st))
        print(f"  -> {mgr.directory} @ epoch {epoch}")

    if args.pixel:
        from flowerdiff.train.pixel_ddpm import create_pixel_diffusion_state

        if preset.pixel is None:
            raise SystemExit(
                f"preset {args.preset} has no pixel pipeline — use v4/v5 for "
                f"diffusion_unet_pixels.pth")
        print(f"Importing pixel UNet from {args.pixel}")
        res = import_pixel_unet(load_torch_file(args.pixel))
        report("pixel_unet", res)
        pcfg = preset.pixel
        detected = (res.aux["base_channels"], res.aux["time_emb_dim"],
                    res.aux["learnable_residual"])
        expected = (pcfg.base_channels, pcfg.time_emb_dim,
                    pcfg.learnable_residual)
        if detected != expected:
            raise SystemExit(
                f"checkpoint geometry {detected} does not match preset "
                f"{args.preset} {expected} — pick the matching --preset "
                f"(v5 has the learnable residual, v4 does not)")
        st, _, _ = create_pixel_diffusion_state(rng, pcfg)
        st = st.replace(params=jax.tree.map(
            lambda a: jax.numpy.asarray(a), res.params))
        epoch = (args.diff_epoch
                 or parse_epoch_from_filename(args.pixel)
                 or preset.pixel_epochs)
        mgr = CheckpointManager(os.path.join(args.out, "ckpt_pixel"))
        mgr.save(epoch, state_to_tree(st))
        print(f"  -> {mgr.directory} @ epoch {epoch}")

    print("\nDone. Resume with:")
    flags = "" if args.preset in ("v4", "v5") else " --raw_latents"
    print(f"  python main.py --version {args.preset} --results_dir {args.out}"
          f"{flags}")


if __name__ == "__main__":
    main()
