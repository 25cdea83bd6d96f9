"""DDPM noise schedule tables.

Parity target: linear beta in [1e-4, 0.02] over 1000 steps with
alpha = 1 - beta, alpha_bar = cumprod(alpha)
(v1/model_train_test.py:569-572; v4:144-146). The tables are computed exactly
like torch.linspace in float32 so golden tests can compare bitwise.

The tables are small constants; under jit they are baked into the compiled
executable, so every gather `alpha_bar[t]` is a cheap on-chip lookup.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Immutable DDPM schedule tables (all shape (n_steps,), float32)."""

    beta: jax.Array
    alpha: jax.Array
    alpha_bar: jax.Array

    @property
    def n_steps(self) -> int:
        return self.beta.shape[0]


def linear_schedule(
    n_steps: int = 1000, beta_start: float = 1e-4, beta_end: float = 0.02
) -> DiffusionSchedule:
    """Linear beta schedule (v1:569). torch.linspace evaluates
    start + i * (end - start) / (steps - 1) in float32; jnp.linspace matches
    that recurrence for these endpoints.
    """
    beta = jnp.linspace(beta_start, beta_end, n_steps, dtype=jnp.float32)
    alpha = 1.0 - beta
    alpha_bar = jnp.cumprod(alpha)
    return DiffusionSchedule(beta=beta, alpha=alpha, alpha_bar=alpha_bar)
