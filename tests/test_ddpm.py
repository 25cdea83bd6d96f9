"""DDPM math tests (SURVEY.md §4: q_sample statistics, p_sample t=0
determinism, eps-loss shape/reduction, scan-sampler equivalence)."""
import jax
import jax.numpy as jnp
import numpy as np

from flowerdiff.diffusion import (
    ddim_sample,
    ddpm_eps_loss,
    linear_schedule,
    p_sample,
    q_sample,
    sample,
    sample_with_trajectory,
)
from flowerdiff.diffusion.sampler import sample_from


SCHED = linear_schedule(50, 1e-4, 0.02)


def test_q_sample_closed_form():
    x0 = jnp.ones((4, 8))
    eps = jnp.full((4, 8), 2.0)
    t = jnp.array([0, 10, 25, 49])
    xt = q_sample(SCHED, x0, t, eps)
    abar = np.asarray(SCHED.alpha_bar)[np.asarray(t)]
    expected = np.sqrt(abar)[:, None] * 1.0 + np.sqrt(1 - abar)[:, None] * 2.0
    np.testing.assert_allclose(
        np.asarray(xt), np.broadcast_to(expected, (4, 8)), rtol=1e-5
    )


def test_q_sample_statistics():
    """At any t, q(x_t | x_0=0) is N(0, 1 - abar_t)."""
    key = jax.random.key(0)
    x0 = jnp.zeros((20_000, 4))
    t = jnp.full((20_000,), 30)
    eps = jax.random.normal(key, x0.shape)
    xt = q_sample(SCHED, x0, t, eps)
    var = float(jnp.var(xt))
    expected = 1.0 - float(SCHED.alpha_bar[30])
    np.testing.assert_allclose(var, expected, rtol=0.05)


def test_q_sample_4d_broadcast():
    x0 = jnp.ones((2, 8, 8, 3))
    eps = jnp.zeros_like(x0)
    xt = q_sample(SCHED, x0, jnp.array([0, 49]), eps)
    assert xt.shape == x0.shape
    np.testing.assert_allclose(
        np.asarray(xt[1]), np.sqrt(float(SCHED.alpha_bar[49])), rtol=1e-5
    )


def test_p_sample_t0_is_deterministic():
    """v1:588-592: no noise is added at t=0."""
    xt = jnp.ones((3, 4))
    eps_theta = jnp.full((3, 4), 0.5)
    noise = jnp.full((3, 4), 100.0)  # would blow up the result if applied
    t0 = jnp.zeros((3,), jnp.int32)
    out = p_sample(SCHED, xt, t0, eps_theta, noise)
    alpha0 = float(SCHED.alpha[0])
    abar0 = float(SCHED.alpha_bar[0])
    expected = (1.0 - (1 - alpha0) / np.sqrt(1 - abar0) * 0.5) / np.sqrt(alpha0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_p_sample_adds_beta_noise_for_t_positive():
    xt = jnp.zeros((2, 4))
    eps_theta = jnp.zeros((2, 4))
    noise = jnp.ones((2, 4))
    t = jnp.array([10, 10])
    out = p_sample(SCHED, xt, t, eps_theta, noise)
    np.testing.assert_allclose(
        np.asarray(out), np.sqrt(float(SCHED.beta[10])), rtol=1e-6
    )


def test_eps_loss_runs_and_is_positive():
    def eps_fn(xt, t):
        return xt * 0.1

    loss = ddpm_eps_loss(SCHED, eps_fn, jax.random.key(1), jnp.ones((8, 16)))
    assert loss.shape == ()
    assert float(loss) > 0

    loss_mse = ddpm_eps_loss(
        SCHED, eps_fn, jax.random.key(1), jnp.ones((8, 4, 4, 3)), distance="mse"
    )
    assert float(loss_mse) > 0


def test_scan_sampler_matches_python_loop():
    """The lax.scan sampler must be step-for-step identical to an explicit
    python loop using the same per-step rng discipline."""

    def eps_fn(xt, t):
        return 0.1 * xt  # linear fake denoiser

    key = jax.random.key(42)
    out = sample(SCHED, eps_fn, key, (3, 8))

    init_key, scan_key = jax.random.split(key)
    x = jax.random.normal(init_key, (3, 8))
    k = scan_key
    for t in range(SCHED.n_steps - 1, -1, -1):
        k, nkey = jax.random.split(k)
        t_vec = jnp.full((3,), t, jnp.int32)
        noise = jax.random.normal(nkey, x.shape)
        x = p_sample(SCHED, x, t_vec, eps_fn(x, t_vec), noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_trajectory_capture():
    def eps_fn(xt, t):
        return 0.1 * xt

    x, traj = sample_with_trajectory(SCHED, eps_fn, jax.random.key(0), (2, 4))
    assert traj.shape == (SCHED.n_steps, 2, 4)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(x), atol=1e-6)


def test_sample_from_partial_denoise():
    def eps_fn(xt, t):
        return 0.1 * xt

    xt = jnp.ones((2, 4))
    out = sample_from(SCHED, eps_fn, jax.random.key(0), xt, 10)
    assert out.shape == xt.shape and bool(jnp.isfinite(out).all())


def test_ddim_shape_and_determinism():
    def eps_fn(xt, t):
        return 0.1 * xt

    a = ddim_sample(SCHED, eps_fn, jax.random.key(7), (2, 8), num_steps=10)
    b = ddim_sample(SCHED, eps_fn, jax.random.key(7), (2, 8), num_steps=10)
    assert a.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampler_jits_with_conditioning():
    def eps_fn(xt, t, c):
        return 0.1 * xt + 0.01 * c[:, None].astype(jnp.float32)

    fn = jax.jit(
        lambda key, c: sample(SCHED, eps_fn, key, (2, 8), c)
    )
    out = fn(jax.random.key(0), jnp.array([1, 2]))
    assert out.shape == (2, 8) and bool(jnp.isfinite(out).all())
