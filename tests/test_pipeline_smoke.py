"""End-to-end pipeline smoke (SURVEY.md §4 fake-data fast path): the tiny v1
preset and the tiny v4 preset run train->checkpoint->resume on synthetic data
with visualization disabled (the viz suite has its own tests)."""
import numpy as np
import pytest

import jax

from flowerdiff.configs import get_preset, tiny_preset
from flowerdiff.runner import PipelineRunner


@pytest.mark.slow
def test_v1_latent_pipeline_smoke(tmp_path):
    preset = tiny_preset(get_preset("v1"))
    runner = PipelineRunner(
        preset, results_dir=str(tmp_path), dataset="synthetic",
        synthetic_size=24, seed=0,
    )
    trainer, diff = runner.run_latent(
        total_epochs=1, vae_epochs=1, batch_size=8,
        final_sweep=False, cadence_viz=False,
    )
    assert int(trainer.state.gen.step) >= 1
    assert int(diff.state.step) >= 1
    assert (tmp_path / "vae_history.jsonl").exists()
    assert (tmp_path / "autoencoder_losses.png").exists()

    # Train-if-missing: a second runner restores instead of retraining, and
    # the diffusion model resumes at its checkpointed epoch.
    runner2 = PipelineRunner(
        preset, results_dir=str(tmp_path), dataset="synthetic",
        synthetic_size=24, seed=0,
    )
    trainer2, diff2 = runner2.run_latent(
        total_epochs=1, vae_epochs=1, batch_size=8,
        final_sweep=False, cadence_viz=False,
    )
    gen0 = jax.tree.leaves(trainer.state.gen.params)[0]
    gen1 = jax.tree.leaves(trainer2.state.gen.params)[0]
    np.testing.assert_array_equal(np.asarray(gen0), np.asarray(gen1))

    # Quality report (final-sweep component, utils/quality.py): computes and
    # logs classifier accuracy + latent MMD for the trained sampler.
    _, encode_mu_fn, _ = runner2._vae_fns(trainer2.vae, trainer2.state.gen.params)
    _raw, sampler = runner2._viz_sampler(diff2)
    report = runner2._quality_report(sampler, encode_mu_fn)
    assert 0.0 <= report["classifier_accuracy"] <= 1.0
    # one-epoch sampler may diverge (inf, by contract never nan)
    assert not np.isnan(report["latent_mmd"])
    assert (tmp_path / "sample_quality.jsonl").exists()


@pytest.mark.slow
def test_v4_pixel_pipeline_smoke(tmp_path):
    preset = tiny_preset(get_preset("v4"))
    runner = PipelineRunner(
        preset, results_dir=str(tmp_path), dataset="synthetic",
        synthetic_size=16, seed=0,
    )
    trainer = runner.run_pixel(epochs=1, batch_size=8)
    assert int(trainer.state.step) >= 1
    assert (tmp_path / "samples_grid.png").exists()
    assert (tmp_path / "diffusion_animation.gif").exists()
    assert (tmp_path / "generated_pixel_diffusion.png").exists()  # v4:286


@pytest.mark.slow
def test_bf16_preset_trains(tmp_path):
    """--bf16 lever (configs.bf16_preset): compute in bfloat16, params and
    optimizer state stay f32, training runs and checkpoints end-to-end."""
    from flowerdiff.configs import bf16_preset

    preset = bf16_preset(tiny_preset(get_preset("v1")))
    assert preset.vae.compute_dtype == "bfloat16"
    assert preset.latent.compute_dtype == "bfloat16"
    runner = PipelineRunner(
        preset, results_dir=str(tmp_path), dataset="synthetic",
        synthetic_size=24, seed=0,
    )
    trainer, diff = runner.run_latent(
        total_epochs=1, vae_epochs=1, batch_size=8,
        final_sweep=False, cadence_viz=False,
    )
    assert int(trainer.state.gen.step) >= 1
    for leaf in jax.tree.leaves(trainer.state.gen.params):
        assert leaf.dtype == np.float32  # master weights stay f32
