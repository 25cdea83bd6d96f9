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
