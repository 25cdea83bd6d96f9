"""Golden tests: noise-schedule tables vs the reference's torch formulas
(v1/model_train_test.py:569-572). BASELINE.md requires bitwise-comparable
schedules; torch (CPU) is available in this environment as the oracle."""
import jax.numpy as jnp
import numpy as np
import torch

from flowerdiff.diffusion import linear_schedule


def test_beta_matches_torch_linspace_to_one_ulp():
    """Our table is correctly-rounded (<=0.5 ULP); torch's vectorized float32
    linspace kernel itself carries up to ~1.2 ULP error vs the exact affine,
    so agreement must be within 1 ULP everywhere."""
    sched = linear_schedule(1000, 1e-4, 0.02)
    ref = torch.linspace(0.0001, 0.02, 1000).numpy()
    ours = np.asarray(sched.beta)
    ulp = np.abs(ours.astype(np.float64) - ref.astype(np.float64)) / np.spacing(ref)
    assert ulp.max() <= 1.0, ulp.max()


def test_beta_is_correctly_rounded():
    sched = linear_schedule(1000, 1e-4, 0.02)
    i = np.arange(1000, dtype=np.float64)
    exact = (1e-4 + i * (0.02 - 1e-4) / 999).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(sched.beta), exact)


def test_alpha_bar_matches_torch_cumprod():
    sched = linear_schedule(1000, 1e-4, 0.02)
    ref = torch.cumprod(1 - torch.linspace(0.0001, 0.02, 1000), dim=0).numpy()
    np.testing.assert_allclose(np.asarray(sched.alpha_bar), ref, rtol=2e-6)


def test_closed_form_endpoints():
    sched = linear_schedule(1000, 1e-4, 0.02)
    assert float(sched.beta[0]) == np.float32(1e-4)
    assert float(sched.beta[-1]) == np.float32(0.02)
    assert sched.n_steps == 1000
    # alpha_bar is strictly decreasing in (0, 1]
    ab = np.asarray(sched.alpha_bar)
    assert (np.diff(ab) < 0).all() and ab[0] < 1.0 and ab[-1] > 0.0


def test_small_schedule():
    sched = linear_schedule(10, 1e-4, 0.02)
    assert sched.beta.shape == (10,)
    np.testing.assert_allclose(
        np.asarray(sched.alpha), 1.0 - np.asarray(sched.beta), rtol=0
    )
