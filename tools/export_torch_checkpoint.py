#!/usr/bin/env python
"""Export flowerdiff checkpoints as reference-loadable PyTorch .pt files.

The inverse of tools/import_torch_checkpoint.py: a flowerdiff results_dir
(Orbax step directories) converts into the exact .pt layouts the reference
scripts read —

  flower_autoencoder.pt           {'autoencoder': sd, 'discriminator': sd}
                                  (v1/model_train_test.py:1188-1191)
  conditional_diffusion_epoch_N.pt  raw ConditionalUNet state_dict (v1:1283)
  diffusion_unet_pixels.pth         raw SimpleUNet state_dict (v4:252/v5:275)

so `SimpleAutoencoder().load_state_dict(...)` / the reference's
filename-epoch resume (v1:1352-1363) run on flowerdiff-trained weights.
Forward parity and strict-load key completeness are pinned by
tests/test_torch_import.py; the two documented approximations are the
discriminator's GroupNorm->BatchNorm affines (+ fresh BN running stats) and
the reference's dead ModuleList tails (zero-filled — never used in forward,
v1:510-516 vs 541-556).

Usage:
  python tools/export_torch_checkpoint.py --preset v1 --results_dir results_v1 \
      --out exported/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="v1",
                    choices=["v1", "v2", "v3", "v4", "v5"])
    ap.add_argument("--results_dir", required=True,
                    help="flowerdiff results dir holding ckpt_vae/, "
                         "ckpt_diffusion/ and/or ckpt_pixel/")
    ap.add_argument("--out", required=True, help="directory for the .pt files")
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step/epoch to export (default: latest)")
    ap.add_argument("--ema", action="store_true",
                    help="export the denoiser's EMA weights instead of the "
                         "raw training weights")
    args = ap.parse_args()

    import jax
    import torch

    if os.environ.get("FLOWERDIFF_PLATFORM"):
        # the axon TPU plugin pre-sets jax_platforms, overriding JAX_PLATFORMS
        # (and its tunnel init can block for minutes); honor an explicit
        # framework-level platform request, as cli.py does
        jax.config.update("jax_platforms", os.environ["FLOWERDIFF_PLATFORM"])

    from flowerdiff.configs import get_preset
    from flowerdiff.train.checkpoints import (
        CheckpointManager,
        state_to_tree,
        vae_gan_state_to_tree,
    )
    from flowerdiff.utils.torch_import import (
        export_autoencoder,
        export_discriminator,
        export_latent_denoiser,
        export_pixel_unet,
    )

    preset = get_preset(args.preset)
    rng = jax.random.PRNGKey(0)
    os.makedirs(args.out, exist_ok=True)

    def report(name, res):
        print(f"  {name}: {len(res.used)} tensors exported, "
              f"{len(res.approximated)} approximated/synthesized")
        for k in res.approximated:
            print(f"    ~ {k}")

    def to_torch_sd(sd):
        return {k: torch.tensor(v) for k, v in sd.items()}

    did = False
    vae_dir = os.path.join(args.results_dir, "ckpt_vae")
    if os.path.isdir(vae_dir):
        from flowerdiff.train.vae_gan import create_vae_gan_state

        state, _, _ = create_vae_gan_state(rng, preset.vae,
                                           img_size=preset.img_size)
        mgr = CheckpointManager(vae_dir)
        step = args.step or mgr.latest_step()
        tree = mgr.restore(step, like=vae_gan_state_to_tree(state))
        print(f"Exporting VAE-GAN from {vae_dir} @ step {step}")
        params = jax.device_get(tree["gen"]["params"])
        centers = jax.device_get(tree["centers"])
        ae = export_autoencoder(params, class_centers=centers)
        report("autoencoder", ae)
        d_res = export_discriminator(jax.device_get(tree["disc"]["params"]))
        report("discriminator", d_res)
        out = os.path.join(args.out, "flower_autoencoder.pt")
        torch.save({"autoencoder": to_torch_sd(ae.params),
                    "discriminator": to_torch_sd(d_res.params)}, out)
        print(f"  -> {out}")
        did = True

    diff_dir = os.path.join(args.results_dir, "ckpt_diffusion")
    if os.path.isdir(diff_dir):
        from flowerdiff.train.latent_ddpm import create_latent_diffusion_state

        st, _, _ = create_latent_diffusion_state(rng, preset.latent)
        mgr = CheckpointManager(diff_dir)
        step = args.step or mgr.latest_step()
        tree = mgr.restore(step, like=state_to_tree(st))
        which = "ema_params" if args.ema and "ema_params" in tree else "params"
        print(f"Exporting latent denoiser from {diff_dir} @ step {step} "
              f"({which})")
        res = export_latent_denoiser(jax.device_get(tree[which]))
        report("denoiser", res)
        out = os.path.join(args.out, f"conditional_diffusion_epoch_{step}.pt")
        torch.save(to_torch_sd(res.params), out)
        print(f"  -> {out}")
        did = True

    pixel_dir = os.path.join(args.results_dir, "ckpt_pixel")
    if os.path.isdir(pixel_dir):
        from flowerdiff.train.pixel_ddpm import create_pixel_diffusion_state

        if preset.pixel is None:
            raise SystemExit(
                f"preset {args.preset} has no pixel pipeline but "
                f"{pixel_dir} exists — use --preset v4 or v5")
        st, _, _ = create_pixel_diffusion_state(rng, preset.pixel)
        mgr = CheckpointManager(pixel_dir)
        step = args.step or mgr.latest_step()
        tree = mgr.restore(step, like=state_to_tree(st))
        print(f"Exporting pixel UNet from {pixel_dir} @ step {step}")
        res = export_pixel_unet(jax.device_get(tree["params"]))
        report("pixel_unet", res)
        out = os.path.join(args.out, "diffusion_unet_pixels.pth")
        torch.save(to_torch_sd(res.params), out)
        print(f"  -> {out}")
        did = True

    if not did:
        raise SystemExit(f"no ckpt_vae/, ckpt_diffusion/ or ckpt_pixel/ "
                         f"under {args.results_dir}")
    print("\nDone. Load in the reference with torch.load(..., "
          "map_location=...) as usual.")


if __name__ == "__main__":
    main()
