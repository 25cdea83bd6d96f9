"""Test harness config.

Runs everything on CPU with 8 virtual XLA devices — the standard JAX
substitute for a real multi-chip mesh (SURVEY.md §4) — and enables the
persistent compilation cache so repeated test runs skip XLA compiles.
Must set env vars BEFORE jax is imported anywhere.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src")
if _SRC not in sys.path:
    sys.path.insert(0, _SRC)

import jax  # noqa: E402

# The axon TPU plugin pre-sets jax_platforms='axon,cpu', which overrides the
# JAX_PLATFORMS env var — force the CPU platform explicitly so the 8 virtual
# devices are used.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.key(0)
