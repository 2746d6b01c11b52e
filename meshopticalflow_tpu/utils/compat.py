"""Workarounds for the experimental axon TPU backend.

Verified miscompilation (jax 0.9.0, axon v5e plugin): under jit,
``jnp.concatenate([s[:T, :c], s[T:, c:]], axis=1)`` — concatenating column
ranges of two row-slices of the same array — produces wrong values for
large row counts, while each slice alone and eager execution are correct
(see tests/test_backend_compat.py for the probe). ``concat_columns``
builds the same result from zero-padded elementwise adds, which compile
correctly.
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS`` authoritative on this runtime.

    The axon TPU plugin registers itself ahead of the env-var selection, so
    ``JAX_PLATFORMS=cpu python -m …`` can still attach to the tunneled TPU
    — which hard-crashes the device worker if another process owns it.
    CLI entry points call this before any other jax use; it re-applies the
    env choice through jax.config (which the plugin does respect)."""
    plat = os.environ.get("JAX_PLATFORMS", "").strip()
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def concat_columns(*parts: jnp.ndarray) -> jnp.ndarray:
    """Column-wise concatenation via pad+add (axis=1), miscompile-safe."""
    total = sum(p.shape[1] for p in parts)
    out = None
    off = 0
    for p in parts:
        padded = jnp.pad(p, ((0, 0), (off, total - off - p.shape[1])))
        out = padded if out is None else out + padded
        off += p.shape[1]
    return out
