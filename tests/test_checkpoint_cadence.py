"""`checkpoint_every` decouples the diffusion checkpoint cadence from the
visualization cadence. Default (None) keeps the reference behavior — a save
at every viz boundary (v1:1282); an explicit value thins the saves so long
fused runs aren't dominated by full-state Orbax writes."""
import dataclasses

from flowerdiff.configs import get_preset, tiny_preset
from flowerdiff.runner import PipelineRunner
from flowerdiff.train.checkpoints import CheckpointManager


def _runner(tmp_path, viz_every):
    preset = tiny_preset(get_preset("v1"))
    preset = dataclasses.replace(preset, diffusion_visualize_every=viz_every)
    return PipelineRunner(
        preset, results_dir=str(tmp_path), dataset="synthetic",
        synthetic_size=24, seed=0,
    )


def test_default_checkpoints_at_viz_cadence(tmp_path):
    runner = _runner(tmp_path, viz_every=2)
    runner.run_latent(total_epochs=6, vae_epochs=1, batch_size=8,
                      final_sweep=False, cadence_viz=False)
    mgr = CheckpointManager(str(tmp_path / "ckpt_diffusion"))
    assert mgr.all_steps() == [2, 4, 6]


def test_checkpoint_every_thins_saves(tmp_path):
    runner = _runner(tmp_path, viz_every=2)
    runner.run_latent(total_epochs=6, vae_epochs=1, batch_size=8,
                      final_sweep=False, cadence_viz=False,
                      checkpoint_every=3)
    mgr = CheckpointManager(str(tmp_path / "ckpt_diffusion"))
    assert mgr.all_steps() == [3, 6]


def test_vae_stage_honors_checkpoint_every(tmp_path):
    """Round-5: the VAE-GAN stage's full-state saves follow
    --checkpoint_every too (a save is a whole-state D2H; at the default
    viz-coupled cadence it can dominate a fast fused stage)."""
    preset = tiny_preset(get_preset("v1"))
    preset = dataclasses.replace(preset, vae_visualize_every=2)
    runner = PipelineRunner(
        preset, results_dir=str(tmp_path), dataset="synthetic",
        synthetic_size=24, seed=0,
    )
    runner.run_latent(total_epochs=1, vae_epochs=6, batch_size=8,
                      final_sweep=False, cadence_viz=False,
                      checkpoint_every=100)
    mgr = CheckpointManager(str(tmp_path / "ckpt_vae"))
    # Only the end-of-stage saves remain: the final state (epoch 6) and the
    # best-checkpoint-policy save (whatever epoch won). The viz-cadence save
    # at epoch 2 must be gone — the default (no checkpoint_every) would have
    # produced saves at 2, 4 AND 6.
    steps = mgr.all_steps()
    assert 6 in steps and 2 not in steps and len(steps) <= 2
