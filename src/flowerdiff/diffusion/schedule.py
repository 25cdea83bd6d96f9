"""DDPM noise schedule tables.

Parity target: linear beta in [1e-4, 0.02] over 1000 steps with
alpha = 1 - beta, alpha_bar = cumprod(alpha)
(v1/model_train_test.py:569-572; v4:144-146). The tables are computed exactly
like torch.linspace in float32 so golden tests can compare bitwise.

The tables are SMALL DATA, not program constants: every hot path
(diffusion/api.py, sampler.py, train/*.py) threads the schedule through jit
as an ARGUMENT, because on this platform programs with embedded array
constants pay a large per-call re-staging penalty (measured; see
BASELINE.md). `DiffusionSchedule` is a registered pytree dataclass precisely
so it can ride through jit argument lists; gathers like `alpha_bar[t]` are
cheap on-chip lookups either way.
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
    """Linear beta schedule (v1:569): start + i * (end - start) / (n - 1).

    The table is built correctly-rounded: the affine form is evaluated in
    float64 on host (it is a compile-time constant) and rounded once to
    float32 — max error 0.5 ULP. torch.linspace's vectorized float32 kernel
    carries up to ~1.2 ULP error against the exact value, so torch parity
    holds to 1 ULP (asserted by the golden test); alpha_bar is computed in
    float64 before the final cast for the same reason.
    """
    import numpy as np

    i = np.arange(n_steps, dtype=np.float64)
    beta64 = beta_start + i * (beta_end - beta_start) / (n_steps - 1)
    alpha64 = 1.0 - beta64
    alpha_bar64 = np.cumprod(alpha64)
    return DiffusionSchedule(
        beta=jnp.asarray(beta64, jnp.float32),
        alpha=jnp.asarray(alpha64, jnp.float32),
        alpha_bar=jnp.asarray(alpha_bar64, jnp.float32),
    )
