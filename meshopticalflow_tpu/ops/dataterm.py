"""Per-triangle Gauss-Newton optical-flow data term (device, jnp).

Rebuild of SetDataTerm (OpticalFlow.cpp:394-421): for the averaged signal
f = (s0 + s1)/2 on each triangle, gamma = (f1 - f0, f2 - f0) is the signal
differential in barycentric coordinates; the normal equations per triangle
are D = sum_c gamma gamma^T * area and rhs = sum_c gamma * meanDiff * area.

Note: the reference writes the rhs with ``for(k=0;k<3;k++)`` which reads
``gamma[2]`` out of bounds and writes ``rhs[2t+2]`` into the next triangle's
slot (OpticalFlow.cpp:418) — undefined behavior in the original. This
implementation uses the mathematically intended k<2 loop.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def data_term_blocks(
    triangles: jnp.ndarray,      # (T, 3) int32
    area: jnp.ndarray,           # (T,)
    values0: jnp.ndarray,        # (V, C) resampled source signal
    values1: jnp.ndarray,        # (V, C) resampled target signal
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns D: (T, 2, 2) and rhs: (T, 2)."""
    v0 = values0[triangles]      # (T, 3, C)
    v1 = values1[triangles]
    f = (v0 + v1) * 0.5
    mean_diff = jnp.mean(v0 - v1, axis=1)                      # (T, C)
    gamma = jnp.stack([f[:, 1] - f[:, 0], f[:, 2] - f[:, 0]], axis=1)  # (T, 2, C)
    d = jnp.einsum("tkc,tlc->tkl", gamma, gamma) * area[:, None, None]
    rhs = jnp.einsum("tkc,tc->tk", gamma, mean_diff) * area[:, None]
    return d, rhs
