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

import os
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


def build_quad_table(texture: jnp.ndarray) -> jnp.ndarray:
    """(H*W, 12) uint8 table of each texel's bilinear 2x2 footprint —
    [c00 | c10 | c01 | c11] with the sampler's edge clamps baked in
    (x1 = min(x0+1, w-1), y1 = min(y0+1, h-1)).

    Bilinear sampling then gathers ONE row per lane instead of four: on
    the axon TPU backend gathers cost per ROW, and the halfway output
    stage samples 2 x H*W lanes (measured: 2.5 s -> 1.0 s of the warm 4K
    output stage).  u8 storage keeps it at texture size and the
    u8 -> compute-dtype cast after the gather is exact, so the gathered
    VALUES equal the four-gather path's exactly.  Caveat: the quad and
    four-gather programs are different XLA kernels, and LLVM may
    FMA-contract their (identical) blend expressions differently — ±1
    quantization flips on ~0.1% of output pixels were measured between
    them at 256² f64 (90/65,536).  Every production sampler therefore
    routes through the SAME path (quad when bilinear), which keeps the
    fused-output-vs-two-pass bit-identity contract exact; the thresholded
    reference goldens are insensitive to the wobble either way."""
    h, w = texture.shape[:2]
    t = texture.astype(jnp.uint8)                      # exact: values are u8
    right = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
    down = jnp.concatenate([t[1:], t[-1:]], axis=0)
    downright = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    return jnp.concatenate([t, right, down, downright],
                           axis=-1).reshape(h * w, 12)


def sample_texture_bilinear(texture: jnp.ndarray, uv: jnp.ndarray,
                            bilinear: bool = True,
                            quad: jnp.ndarray | None = None) -> jnp.ndarray:
    """Texture fetch with the reference's y-flip + clamp (MeshFlow.inl:65-84).

    texture: (H, W, 3) float; uv: (N, 2) in [0,1] uv space (v up).
    ``quad``: optional build_quad_table(texture) — one-row-per-lane
    bilinear gathers, bit-identical output.
    """
    h, w = texture.shape[:2]
    x = jnp.clip(uv[:, 0], 0.0, 1.0) * (w - 1)
    y = jnp.clip(1.0 - uv[:, 1], 0.0, 1.0) * (h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    if not bilinear:
        return texture.reshape(-1, texture.shape[-1])[y0 * w + x0]
    dx = (x - x0).astype(texture.dtype)[:, None]
    dy = (y - y0).astype(texture.dtype)[:, None]
    if quad is not None:
        c = texture.shape[-1]
        rows = quad[y0 * w + x0].astype(texture.dtype)
        c00, c10, c01, c11 = (rows[:, :c], rows[:, c:2 * c],
                              rows[:, 2 * c:3 * c], rows[:, 3 * c:])
    else:
        flat = texture.reshape(-1, texture.shape[-1])
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
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


# ----------------------------------------------------------------------------
# Compacted tracing: heavy-tailed path lengths mean most lanes finish in a
# few dozen steps while the while_loop pays the max over ALL lanes. Chunk
# the march and gather the surviving lanes into a small buffer between
# chunks (host-orchestrated; ~2x-4x on the 2K advection).
# ----------------------------------------------------------------------------

import functools as _ft

from meshopticalflow_tpu.kernels.tracing import flow_field_trace as _fft


@_ft.partial(jax.jit, static_argnames=("min_step", "steps"))
def _trace_phase1(tm, vfield, times, t0, p0, min_step, steps):
    return _fft(tm, vfield, times, t0, p0, min_step, max_steps=steps,
                with_state=True)


@_ft.partial(jax.jit, static_argnames=("bucket",))
def _compact(state, times, bucket: int):
    n = state["t"].shape[0]
    idx = jnp.nonzero(state["active"], size=bucket, fill_value=n)[0]
    sub = {k: (v if k == "count" else
               jax.tree_util.tree_map(lambda a: a[jnp.minimum(idx, n - 1)], v))
           for k, v in state.items()}
    fill = idx >= n
    sub["active"] = sub["active"] & ~fill
    return sub, idx, times[jnp.minimum(idx, n - 1)]


@_ft.partial(jax.jit, static_argnames=("min_step", "steps"))
def _trace_resume(tm, vfield, times, sub_state, min_step, steps):
    t_stub = sub_state["t"]
    p_stub = jnp.stack([sub_state["px"], sub_state["py"]], -1)
    return _fft(tm, vfield, times, t_stub, p_stub, min_step, max_steps=steps,
                init_state=sub_state, with_state=True)


@jax.jit
def _scatter_back(state, idx, sub):
    out = dict(state)
    for k in ("t", "px", "py", "vx", "vy", "ft", "step_left", "in_edge",
              "active"):
        out[k] = state[k].at[idx].set(sub[k], mode="drop")
    return out


def flow_field_trace_compacted(tm, vfield, times, t0, p0, min_step,
                               max_steps: int = 4096, phase_steps: int = 64,
                               escalate: int = 16, slab_max: int = 1 << 23):
    """flow_field_trace with between-phase compaction of active lanes.

    Returns (t1, p1, exhausted_count). Bit-identical to the plain loop —
    compaction only reorders which lanes march together.

    ``escalate`` handles cap stragglers (VERDICT r2 next #9): lanes still
    active after ``max_steps`` keep marching — compacted, so the cost is
    proportional to the few survivors — with a total budget of
    ``escalate * max_steps`` steps, emulating the reference's effectively
    unbounded cap (1e6, FEM.inl:905) instead of freezing lanes mid-path.

    ``slab_max`` bounds how many lanes march in ONE compiled while_loop.
    Lanes are independent, so wider tables (the 4K atlas fuses 2 x 16.7M
    lanes) split into equal slabs processed sequentially. This is a memory
    guard, not a tuning knob: XLA:TPU's remat pass, under HBM pressure,
    compresses a loop-spanning (N, 2) fusion and materializes the
    uncompressed copy in the padded {1,0:T(8,128)} layout — 64x the value's
    true size, 16 GB at 33.5M lanes (observed OOM). 8.4M lanes (the proven
    2K fused width) keeps the whole march comfortably under pressure
    thresholds. Override via MESHFLOW_TRACE_SLAB."""
    n = t0.shape[0]
    slab_max = int(os.environ.get("MESHFLOW_TRACE_SLAB", slab_max))
    if n > slab_max:
        n_slabs = -(-n // slab_max)
        slab = -(-n // n_slabs)
        # align so at most 2 distinct shapes compile, but never exceed the
        # guard itself (each chunk then takes the non-slab branch below)
        slab = min(-(-slab // 1024) * 1024, slab_max)
        ts, ps, exhausted = [], [], 0
        for a in range(0, n, slab):
            b = min(n, a + slab)
            t_s, p_s, ex = flow_field_trace_compacted(
                tm, vfield, times[a:b], t0[a:b], p0[a:b], min_step,
                max_steps, phase_steps, escalate, slab_max)
            ts.append(t_s)
            ps.append(p_s)
            exhausted += ex
        return jnp.concatenate(ts), jnp.concatenate(ps), exhausted
    total_budget = max_steps * max(int(escalate), 1)
    state = _trace_phase1(tm, vfield, times, t0, p0, min_step, phase_steps)
    steps_done = phase_steps
    while steps_done < total_budget:
        n_active = int(jnp.sum(state["active"].astype(jnp.int32)))
        if n_active == 0:
            break
        bucket = max(8192, 1 << (n_active - 1).bit_length())
        if bucket >= n and steps_done < max_steps:
            # compaction won't shrink the problem; run full-width to the
            # base cap, then fall through to compacted escalation
            state = _trace_resume(tm, vfield, times, state, min_step,
                                  max_steps - steps_done)
            steps_done = max_steps
            continue
        sub, idx, sub_times = _compact(state, times, bucket)
        # Steps per round scale inversely with the bucket: every round ends
        # in a host round trip (the survivor count fetch, ~0.2 s on the
        # tunneled runtime), so small straggler buckets march LONG legs —
        # the wasted masked gathers are bounded by the bucket size while
        # the round count for heavy-tailed paths drops ~8x.
        base = max(phase_steps * 2, 128)
        steps = min(base * max(1, (1 << 16) // bucket),
                    total_budget - steps_done)
        sub = _trace_resume(tm, vfield, sub_times, sub, min_step, steps)
        state = _scatter_back(state, idx, sub)
        steps_done += steps
    valid = t0 >= 0
    final_t = jnp.where(valid, state["t"], t0)
    state_p = jnp.stack([state["px"], state["py"]], -1)
    final_p = jnp.where(valid[:, None], state_p, p0)
    exhausted = int(jnp.sum(state["active"].astype(jnp.int32)))
    return final_t.astype(jnp.int32), final_p, exhausted


@_ft.partial(jax.jit, static_argnames=("bilinear",))
def _fetch_colors(tm, tri_uvs, texture, t1, p1, bilinear: bool, quad=None):
    t_safe = jnp.maximum(t1, 0)
    corners = tri_uvs[t_safe]
    w0 = (1.0 - p1[:, 0] - p1[:, 1])[:, None]
    uv = corners[:, 0] * w0 + corners[:, 1] * p1[:, 0:1] + corners[:, 2] * p1[:, 1:2]
    colors = sample_texture_bilinear(texture, uv, bilinear, quad=quad)
    return jnp.where((t1 >= 0)[:, None], colors, 0.0)


def advect_texture_compacted(tm, vfield, tri_uvs, texture, src_t, src_p,
                             length, min_step: float = 1e-2,
                             max_steps: int = 4096, bilinear: bool = True,
                             quad=None):
    """Host-orchestrated advect_texture_step with lane compaction.

    Returns (colors, t1, p1, exhausted)."""
    n = src_t.shape[0]
    times = jnp.broadcast_to(jnp.asarray(length, src_p.dtype), (n,))
    t1, p1, exhausted = flow_field_trace_compacted(
        tm, vfield, times, src_t, src_p, min_step, max_steps)
    colors = _fetch_colors(tm, tri_uvs, texture, t1, p1, bilinear, quad=quad)
    return colors, t1, p1, exhausted


@_ft.partial(jax.jit, static_argnames=("frames", "min_step", "max_steps",
                                       "bilinear"))
def advect_texture_frames_scan(tm, vfield, tri_uvs, texture, src_t, src_p,
                               alpha, frames: int, min_step: float = 1e-2,
                               max_steps: int = 4096, bilinear: bool = True,
                               quad=None):
    """N-frame texture interpolation as ONE jitted lax.scan over frames
    (SURVEY.md section 5 long-context row; the reference loops on the host,
    OpticalFlow.cpp:517-539). Each step flows the texel table by ``alpha``
    and samples the ORIGINAL texture at the advected position. Returns
    colors (frames-1, N, 3) for frames 1..frames-1."""
    n = src_t.shape[0]

    def step(carry, _):
        t, p = carry
        t1, p1 = _fft(tm, vfield, jnp.broadcast_to(alpha, (n,)), t, p,
                      min_step * frames, max_steps)
        colors = _fetch_colors(tm, tri_uvs, texture, t1, p1, bilinear,
                               quad=quad)
        return (t1, p1), colors

    (_, _), colors = jax.lax.scan(step, (src_t, src_p), None, length=frames - 1)
    return colors


@_ft.partial(jax.jit, static_argnames=("min_step", "max_steps"))
def resample_signal_composed_whitney(tm, edge_fields, values, length,
                                     min_step: float = 1e-2,
                                     max_steps: int = 4096):
    """Multi-frame composed-flow signal resampling — the
    ResampleSignalWhitneyComposedFlow analog (OpticalFlow.cpp:239-260).

    Advects every triangle barycenter through a SEQUENCE of Whitney flow
    fields, applied last-to-first exactly like the reference
    (OpticalFlow.cpp:251), each leg a full whitneyFlow march of ``length``,
    then samples the per-vertex signal at the final point and averages into
    vertices. ``edge_fields`` is (F, 3T) signed half-edge coefficients; one
    jitted lax.scan over the F legs replaces the reference's host loop.
    Returns (V, C)."""
    from meshopticalflow_tpu.kernels.tracing import whitney_flow_trace

    t_count = tm.n_triangles
    n_vertices = values.shape[0]
    t0 = jnp.arange(t_count, dtype=jnp.int32)
    p0 = jnp.full((t_count, 2), 1.0 / 3.0, values.dtype)

    def leg(carry, ce):
        t, p = carry
        t1, p1 = whitney_flow_trace(tm, ce, length, t, p, min_step, max_steps)
        return (t1, p1), None

    (t1, p1), _ = jax.lax.scan(leg, (t0, p0), edge_fields[::-1])
    sampled = sample_vertex_signal(tm.triangles, values, t1, p1)
    flat_idx = tm.triangles.ravel()
    out = jax.ops.segment_sum(jnp.repeat(sampled, 3, axis=0), flat_idx,
                              num_segments=n_vertices)
    counts = jax.ops.segment_sum(jnp.ones_like(flat_idx, values.dtype),
                                 flat_idx, num_segments=n_vertices)
    return out / jnp.maximum(counts, 1.0)[:, None]


def flow_field_trace_pairs(tm, vfields, flow_times, t0, p0, min_step,
                           max_steps: int = 4096):
    """vmap over FRAME PAIRS: trace the same lanes through a batch of flow
    fields (the data-parallel multi-pair tracking analog, BASELINE config 5).

    vfields: (P, T, 2); flow_times: (P,) or scalar; t0/p0 shared lanes.
    Returns (t1 (P, N), p1 (P, N, 2))."""
    flow_times = jnp.broadcast_to(jnp.asarray(flow_times, p0.dtype),
                                  (vfields.shape[0],))
    fn = jax.vmap(
        lambda vf, ft: _fft(tm, vf, ft, t0, p0, min_step, max_steps))
    return fn(vfields, flow_times)
