"""Golden tests: noise-schedule tables vs the reference's torch formulas
(v1/model_train_test.py:569-572). BASELINE.md requires bitwise-comparable
schedules; torch (CPU) is available in this environment as the oracle."""
import jax.numpy as jnp
import numpy as np
import torch

from flowerdiff.diffusion import linear_schedule


def test_beta_bitwise_matches_torch_linspace():
    sched = linear_schedule(1000, 1e-4, 0.02)
    ref = torch.linspace(0.0001, 0.02, 1000).numpy()
    np.testing.assert_array_equal(np.asarray(sched.beta), ref)


def test_alpha_bar_matches_torch_cumprod():
    sched = linear_schedule(1000, 1e-4, 0.02)
    ref = torch.cumprod(1 - torch.linspace(0.0001, 0.02, 1000), dim=0).numpy()
    np.testing.assert_allclose(np.asarray(sched.alpha_bar), ref, rtol=1e-6)


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
