"""Signal advection and sampling on top of the tracing kernel.

Rebuilds:
  * ResampleSignal (OpticalFlow.cpp:197-216): flow every triangle barycenter
    along the current field, sample the vertex signal there, average into
    vertices;
  * InputTextureData::flow (OpticalFlow.cpp:501-515): flow every valid texel
    of the sample table, fetch the texture at the advected uv;
  * the bilinear texture fetch (MeshFlow.inl:65-84) with its y-flip and
    clamping semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from meshopticalflow_tpu.kernels.tracing import TraceMesh, flow_field_trace


def sample_vertex_signal(triangles: jnp.ndarray, values: jnp.ndarray,
                         t_idx: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Barycentric interpolation of a per-vertex signal (OpticalFlow.cpp:179-194)."""
    tri = triangles[t_idx]                       # (N, 3)
    w0 = 1.0 - p[:, 0] - p[:, 1]
    return (values[tri[:, 0]] * w0[:, None]
            + values[tri[:, 1]] * p[:, 0:1]
            + values[tri[:, 2]] * p[:, 1:2])


def resample_signal(
    tm: TraceMesh,
    vfield: jnp.ndarray,          # (T, 2)
    values: jnp.ndarray,          # (V, C)
    length,                       # scalar flow time
    min_step: float = 1e-2,
    max_steps: int = 4096,
) -> jnp.ndarray:
    """Advect a per-vertex signal by flowing triangle barycenters
    (OpticalFlow.cpp:197-216). Returns (V, C)."""
    t_count = tm.n_triangles
    n_vertices = values.shape[0]
    t0 = jnp.arange(t_count, dtype=jnp.int32)
    p0 = jnp.full((t_count, 2), 1.0 / 3.0, values.dtype)
    t1, p1 = flow_field_trace(tm, vfield, length, t0, p0, min_step, max_steps)
    sampled = sample_vertex_signal(tm.triangles, values, t1, p1)   # (T, C)
    flat_idx = tm.triangles.ravel()
    contrib = jnp.repeat(sampled, 3, axis=0)
    out = jax.ops.segment_sum(contrib, flat_idx, num_segments=n_vertices)
    counts = jax.ops.segment_sum(jnp.ones_like(flat_idx, values.dtype), flat_idx,
                                 num_segments=n_vertices)
    return out / jnp.maximum(counts, 1.0)[:, None]


def resample_signal_pair(
    tm: TraceMesh,
    vfield: jnp.ndarray,          # (T, 2)
    values: jnp.ndarray,          # (V, 2C): the two signals channel-stacked
    length0, length1,             # flow times of the two halves (-0.5 / +0.5)
    min_step: float = 1e-2,
    max_steps: int = 4096,
) -> jnp.ndarray:
    """Advect both comparison signals in ONE trace (UpdateFlow's two
    ResampleSignal calls, OpticalFlow.cpp:439): lanes 0..T-1 flow by
    ``length0`` sampling channels [:C], lanes T..2T-1 by ``length1``
    sampling [C:]. Returns (V, 2C)."""
    t_count = tm.n_triangles
    n_vertices = values.shape[0]
    c = values.shape[1] // 2
    t0 = jnp.tile(jnp.arange(t_count, dtype=jnp.int32), 2)
    p0 = jnp.full((2 * t_count, 2), 1.0 / 3.0, values.dtype)
    times = jnp.concatenate([
        jnp.full(t_count, jnp.asarray(length0, values.dtype)),
        jnp.full(t_count, jnp.asarray(length1, values.dtype))])
    t1, p1 = flow_field_trace(tm, vfield, times, t0, p0, min_step, max_steps)
    sampled = sample_vertex_signal(tm.triangles, values, t1, p1)   # (2T, 2C)
    # concat_columns (not jnp.concatenate): see utils/compat.py for the
    # axon-backend slice+concat miscompilation this avoids.
    from meshopticalflow_tpu.utils.compat import concat_columns
    both = concat_columns(sampled[:t_count, :c], sampled[t_count:, c:])  # (T, 2C)
    flat_idx = tm.triangles.ravel()
    contrib = jnp.repeat(both, 3, axis=0)
    out = jax.ops.segment_sum(contrib, flat_idx, num_segments=n_vertices)
    counts = jax.ops.segment_sum(jnp.ones_like(flat_idx, values.dtype), flat_idx,
                                 num_segments=n_vertices)
    return out / jnp.maximum(counts, 1.0)[:, None]


def sample_texture_bilinear(texture: jnp.ndarray, uv: jnp.ndarray,
                            bilinear: bool = True) -> jnp.ndarray:
    """Texture fetch with the reference's y-flip + clamp (MeshFlow.inl:65-84).

    texture: (H, W, 3) float; uv: (N, 2) in [0,1] uv space (v up).
    """
    h, w = texture.shape[:2]
    x = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1)
    y = jnp.clip(1.0 - uv[:, 1], 0.0, 1.0) * (h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    flat = texture.reshape(-1, texture.shape[-1])
    if not bilinear:
        return flat[y0 * w + x0]
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    dx = (x - x0).astype(texture.dtype)[:, None]
    dy = (y - y0).astype(texture.dtype)[:, None]
    c00 = flat[y0 * w + x0]
    c10 = flat[y0 * w + x1]
    c11 = flat[y1 * w + x1]
    c01 = flat[y1 * w + x0]
    return (c00 * (1 - dx) * (1 - dy) + c10 * dx * (1 - dy)
            + c11 * dx * dy + c01 * (1 - dx) * dy)


def advect_texture_step(
    tm: TraceMesh,
    vfield: jnp.ndarray,
    tri_uvs: jnp.ndarray,
    texture: jnp.ndarray,
    src_t: jnp.ndarray,
    src_p: jnp.ndarray,
    length,
    min_step: float = 1e-2,
    max_steps: int = 4096,
    bilinear: bool = True,
):
    """One advection step: returns (colors, t1, p1) so the sample table can
    be flowed repeatedly (the N-frame interpolation of OpticalFlow.cpp:517-539)."""
    t1, p1 = flow_field_trace(tm, vfield, length, src_t, src_p, min_step, max_steps)
    t_safe = jnp.maximum(t1, 0)
    corners = tri_uvs[t_safe]                     # (N, 3, 2)
    w0 = (1.0 - p1[:, 0] - p1[:, 1])[:, None]
    uv = corners[:, 0] * w0 + corners[:, 1] * p1[:, 0:1] + corners[:, 2] * p1[:, 1:2]
    colors = sample_texture_bilinear(texture, uv, bilinear)
    return jnp.where((t1 >= 0)[:, None], colors, 0.0), t1, p1


def advect_texture(
    tm: TraceMesh,
    vfield: jnp.ndarray,         # (T, 2)
    tri_uvs: jnp.ndarray,        # (T, 3, 2) wedge uvs
    texture: jnp.ndarray,        # (H, W, 3) float
    src_t: jnp.ndarray,          # (N,) int32 texel sample table (-1 invalid)
    src_p: jnp.ndarray,          # (N, 2)
    length,
    min_step: float = 1e-2,
    max_steps: int = 4096,
    bilinear: bool = True,
) -> jnp.ndarray:
    """Advect texels and fetch the texture at the destination
    (InputTextureData::flow, OpticalFlow.cpp:501-515). Returns (N, 3);
    invalid texels return 0."""
    colors, _, _ = advect_texture_step(tm, vfield, tri_uvs, texture, src_t, src_p,
                                       length, min_step, max_steps, bilinear)
    return colors
