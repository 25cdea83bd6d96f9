"""Tracing / profiling / debug-mode hooks (SURVEY.md §5.1-5.2).

The reference has no profiling (tqdm bars + prints only) and no sanitizers;
its numerical-stability story is ad-hoc clamps (v1:340, 381-384). This module
provides the framework-level equivalents:

  - `trace(logdir)`: jax.profiler trace context writing a TensorBoard-
    compatible profile (op-level timing on TPU).
  - `annotate(name)`: TraceAnnotation so custom spans show in the profile.
  - `debug_mode()`: enables jax NaN/Inf checking (every jitted output is
    checked; the functional analogue of the reference's clamp guards) —
    use in tests/debug runs, not production (it disables async dispatch).
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/flowerdiff-profile"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces: `with annotate('vae_fwd'): ...`"""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def debug_mode(nans: bool = True, infs: bool = True):
    """NaN/Inf sanitizer for debugging training instabilities."""
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)
