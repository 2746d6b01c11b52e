"""End-to-end surface optical-flow pipeline (the OpticalFlow app's engine).

Rebuilds the reference driver (OpticalFlow/OpticalFlow.cpp):
  * init (WhitneyFlowViewer::Init, :679-917): load inputs, subdivide, build
    the intrinsic mesh + EdgeXForm tables, bake textures to vertex signals,
    rasterize the texel sample table, preprocess comparison signals
    (log space / DoG bands), build the vector-field basis;
  * per-level UpdateFlow (:423-474): smooth -> advect +-1/2 -> data term ->
    regularized Gauss-Newton step;
  * IterativeOptimization (:1035-1056): coarse-to-fine weight schedule,
    final advection of the original inputs to the halfway point and blend.

jit hygiene matters on the tunneled TPU runtime (eager dispatch ~50 ms/op,
compiles cost tens of seconds): every device computation lives in a
module-level jitted pure function over pytrees, so jax's jit cache (plus the
persistent compilation cache) is hit across calls, levels, and runs.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from meshopticalflow_tpu.config import FlowConfig
from meshopticalflow_tpu.geometry.mesh import HostMesh, build_mesh
from meshopticalflow_tpu.geometry.rasterize import TextureSource, rasterize_texture_source
from meshopticalflow_tpu.geometry.subdivide import subdivide_textured_mesh, subdivide_tracked
from meshopticalflow_tpu.io.ply import read_triangle_mesh, write_ply_colored
from meshopticalflow_tpu.io.png import read_png_rgb, write_png_rgb
from meshopticalflow_tpu.kernels.advect import (
    advect_texture, resample_signal, resample_signal_pair, sample_vertex_signal)
from meshopticalflow_tpu.kernels.tracing import TraceMesh, exp_map, make_trace_mesh
from meshopticalflow_tpu.models.base import BasisDevice, build_basis, update_optical_flow
from meshopticalflow_tpu.ops.dataterm import data_term_blocks
from meshopticalflow_tpu.ops.ell import ell_matvec
from meshopticalflow_tpu.flow.signal import (
    SmoothingOperators, dog_band, log_space, make_smoothing_operators, smooth_signal)
from meshopticalflow_tpu.utils.jitcache import enable_persistent_cache


class ProblemArrays(struct.PyTreeNode):
    """All static device arrays of a flow problem, bundled as one pytree."""

    tm: TraceMesh
    smooth_ops: SmoothingOperators
    basis: BasisDevice
    signals: jnp.ndarray     # (V, 2C) both comparison signals channel-stacked
    area: jnp.ndarray        # (T,)


@dataclasses.dataclass
class FlowResult:
    coeffs: np.ndarray
    tfield: np.ndarray            # (T, 2) final flow field
    metrics: List[Dict]           # per-level metrics


# ----------------------------------------------------------------------------
# Jitted device stages (module level: one compile per shape signature)
# ----------------------------------------------------------------------------

def _preprocess_signals(smooth_ops: SmoothingOperators, raw: jnp.ndarray,
                        config: FlowConfig, vcoarse=None, vpatch=None) -> jnp.ndarray:
    """Comparison-signal construction (OpticalFlow.cpp:820-857).

    raw: (2, V, 3) -> (V, 2C) channel-stacked preprocessed signals.
    Host-orchestrated (the DoG band contains a chunked solve). When the
    vertex multigrid hierarchy is available (vcoarse/vpatch) the DoG
    screened-Poisson solve runs through it — the dogSmooth=1e-4 system is
    stiffness-dominated and plain Jacobi-PCG needs thousands of iterations
    (~7 min of the round-1 init); MG converges in tens."""
    sig = raw
    if config.log_space:
        sig = log_space(sig)
    if config.dog_weight > 0:
        stacked = jnp.concatenate([sig[0], sig[1]], axis=1)        # (V, 6)
        if vcoarse is not None:
            from meshopticalflow_tpu.flow.signal import _dog_renormalize, _smooth_system
            from meshopticalflow_tpu.kernels.pallas_spmv import resolve_flow_backend
            backend = resolve_flow_backend(config.flow_backend, stacked.dtype)
            if vpatch is not None and backend == "pallas":
                class _Arrays:
                    pass
                arr = _Arrays()
                arr.smooth_ops = smooth_ops
                arr.signals = stacked
                solver, b = _vertex_pallas_solver(arr, vcoarse, vpatch,
                                                  jnp.asarray(config.dog_smooth,
                                                              stacked.dtype))
            elif vpatch is not None:
                from meshopticalflow_tpu.solvers.mg3 import ThreeLevelSolver
                sys_vals, b, diag = _smooth_system(smooth_ops, stacked,
                                                   config.dog_smooth)
                c_vals = vcoarse.m0_vals + config.dog_smooth * vcoarse.k0_vals
                # materialize: the patch blocks can be host-side (or
                # LazyNpzArray) f32 under the exact-c1 config — this XLA
                # branch converts and casts to the working dtype itself
                # (the pallas path does so in _vertex_pallas_solver)
                a2 = (jnp.asarray(vpatch.m2_dense, stacked.dtype)
                      + config.dog_smooth
                      * jnp.asarray(vpatch.k2_dense, stacked.dtype))
                solver = ThreeLevelSolver(smooth_ops.cols, sys_vals, diag,
                                          vcoarse.cols0, c_vals, vcoarse.p0_idx,
                                          vcoarse.p0_wt, a2, vpatch.p12_idx,
                                          vpatch.p12_wt)
            else:
                from meshopticalflow_tpu.solvers.twolevel import TwoLevelSolver
                sys_vals, b, diag = _smooth_system(smooth_ops, stacked,
                                                   config.dog_smooth)
                c_vals = vcoarse.m0_vals + config.dog_smooth * vcoarse.k0_vals
                solver = TwoLevelSolver(smooth_ops.cols, sys_vals, diag,
                                        vcoarse.cols0, c_vals, vcoarse.p0_idx,
                                        vcoarse.p0_wt)
            smoothed, _ = solver.solve(b, x0=stacked, tol=config.cg_tol,
                                       max_iters=min(config.cg_max_iters, 400))
            bands = _dog_renormalize(smooth_ops, stacked, smoothed)
        else:
            bands = dog_band(smooth_ops, stacked, config.dog_smooth,
                             tol=config.cg_tol, max_iters=config.cg_max_iters)
        if config.channels == 6:
            out0 = jnp.concatenate([sig[0] * (1 - config.dog_weight),
                                    bands[:, :3] * config.dog_weight], axis=1)
            out1 = jnp.concatenate([sig[1] * (1 - config.dog_weight),
                                    bands[:, 3:] * config.dog_weight], axis=1)
            return jnp.concatenate([out0, out1], axis=1)
        return bands
    return jnp.concatenate([sig[0], sig[1]], axis=1)


@jax.jit
def _coarse_smooth_system(m0_vals, k0_vals, s_weight, diag_slot):
    """Coarse smoothing system M0 + w K0 and its diagonal, one dispatch."""
    c_vals = m0_vals + s_weight * k0_vals
    c_diag = jnp.take_along_axis(c_vals, diag_slot[:, None], axis=1)[:, 0]
    return c_vals, c_diag


def _vertex_pallas_solver(arrays: ProblemArrays, vcoarse, vpatch, s_weight,
                          force_dense: bool = False):
    """Multi-rhs Pallas MG solver for the vertex smoothing system; pattern
    pack cached on the vcoarse handle (+ artifact disk cache).
    ``force_dense`` skips the banded c1 and builds the dense-patch-coarsest
    variant — the fallback after a deferred BandedBreakdownError."""
    import scipy.sparse as sp

    from meshopticalflow_tpu.flow.signal import _smooth_system
    from meshopticalflow_tpu.solvers.pallas_mg import (PallasMG3MultiSolver,
                                                       build_mg_pack)

    pack = vcoarse.pallas_pack
    if pack is None:
        idx = np.asarray(vcoarse.p0_idx)
        wt = np.asarray(vcoarse.p0_wt, np.float64)
        v_f, k0 = idx.shape
        v_0 = int(np.asarray(vcoarse.cols0).shape[0])
        p0 = sp.csr_matrix((wt.ravel(), (np.repeat(np.arange(v_f), k0),
                                         idx.ravel())), shape=(v_f, v_0))
        pack = build_mg_pack(np.asarray(arrays.smooth_ops.cols),
                             np.asarray(vcoarse.cols0), p0,
                             np.asarray(vpatch.p12_idx),
                             np.asarray(vpatch.p12_wt),
                             int(vpatch.m2_dense.shape[0]),
                             cache_key=vcoarse.artifact_key)
        vcoarse.pallas_pack = pack
    sys_vals, b, diag = _smooth_system(arrays.smooth_ops, arrays.signals, s_weight)
    # The coarse diagonal slot is static per mesh — computed once on host;
    # the per-level system + diagonal then assemble in ONE dispatch (the
    # eager add/mul/eq/argmax/take chain was ~6 per level).
    slot0 = vcoarse.diag_slot0
    if slot0 is None:
        cols0_h = np.asarray(vcoarse.cols0)
        slot0 = jnp.asarray(np.argmax(
            cols0_h == np.arange(cols0_h.shape[0])[:, None], axis=1), jnp.int32)
        vcoarse.diag_slot0 = slot0
    c_vals, c_diag = _coarse_smooth_system(vcoarse.m0_vals, vcoarse.k0_vals,
                                           s_weight, slot0)
    if force_dense:
        a2 = jnp.asarray(vpatch.m2_dense) + s_weight * jnp.asarray(vpatch.k2_dense)
        return PallasMG3MultiSolver(pack, sys_vals, diag, c_vals, c_diag,
                                    a2), b
    c1_band = vcoarse.c1_band
    if c1_band is None:
        from meshopticalflow_tpu.solvers.pallas_mg import build_c1_band
        key = vcoarse.artifact_key
        c1_band = build_c1_band(pack, np.asarray(vcoarse.cols0),
                                cache_key=(key + ".c1band") if key else "")
        vcoarse.c1_band = c1_band
    solver = PallasMG3MultiSolver(pack, sys_vals, diag, c_vals, c_diag, None,
                                  c1_band=c1_band)
    # (a TOTAL factorization breakdown now surfaces lazily at the first
    # solve fetch as BandedBreakdownError — _stage_smooth rebuilds with
    # force_dense=True)
    return solver, b


# Streamed-GB estimate of the most recent Pallas smoothing solve (None for
# the XLA / plain-CG fallbacks) — feeds the level bandwidth metrics.
_LAST_SMOOTH_GB = [None]

# Max column ||b||^2 of the smoothing rhs, cached per signals array: the rhs
# b = M s is LEVEL-INVARIANT (only the system's s_weight changes), so the
# device norm fetch (~0.1-0.3 s on the tunneled runtime) is paid once per
# problem instead of once per level. Keyed by the signals array identity
# with a weakref guard (vcoarse handles are shared across problem
# constructions by the pack-reuse cache, so they cannot hold this).
import weakref as _weakref

_SMOOTH_BNORM2: Dict = {}


def _smooth_bnorm2(signals, b, subkey) -> float:
    key = (id(signals), subkey)
    entry = _SMOOTH_BNORM2.get(key)
    if entry is None or entry[0]() is not signals:
        val = float(jnp.max(jnp.einsum("nc,nc->c", b, b)))
        while len(_SMOOTH_BNORM2) > 32:
            # Evict oldest-first (insertion order) so the live problem's
            # entries — the newest — survive (same policy as
            # refine._PATTERN_CACHE).
            _SMOOTH_BNORM2.pop(next(iter(_SMOOTH_BNORM2)))
        _SMOOTH_BNORM2[key] = (_weakref.ref(signals), val)
        entry = _SMOOTH_BNORM2[key]
    return entry[1]


def _format_rounds(rounds) -> str:
    """Level-metric rendering of refinement rounds; rel is None for
    pinned-schedule rounds (no per-round residual fetch by design)."""
    return "; ".join(f"{it}@{rel:.1e}" if rel is not None else f"{it}@pinned"
                     for it, rel in rounds)


def _stage_smooth_pallas(arrays: ProblemArrays, config: FlowConfig, solver, b):
    """The Pallas multi-rhs smoothing solve (split in halves past 8
    channels); separated out so the deferred-banded-breakdown fallback can
    redo the whole stage with a rebuilt solver."""
    if b.shape[1] <= 8:
        out, stats = solver.solve(b, x0=arrays.signals, tol=config.cg_tol,
                                  max_iters=min(config.cg_max_iters, 200),
                                  b_norm2=_smooth_bnorm2(arrays.signals,
                                                         b, "full"))
        _LAST_SMOOTH_GB[0] = float(stats.iterations) * solver.gb_per_iter
        return out, stats
    # channels=6 (0<dogWeight<1) stacks 12 signal columns; the tile
    # layout carries 8 per sublane pass — solve in two halves.
    half = (b.shape[1] + 1) // 2
    outs, total_iters, worst = [], 0, 0.0
    for sl in (slice(0, half), slice(half, None)):
        o, st = solver.solve(b[:, sl], x0=arrays.signals[:, sl],
                             tol=config.cg_tol,
                             max_iters=min(config.cg_max_iters, 200),
                             b_norm2=_smooth_bnorm2(arrays.signals,
                                                    b[:, sl], sl.start))
        outs.append(o)
        total_iters += int(st.iterations)
        worst = max(worst, float(st.rel_residual))
    from meshopticalflow_tpu.solvers.cg import CGStats
    stats = CGStats(jnp.asarray(total_iters, jnp.int32),
                    jnp.asarray(worst, b.dtype))
    _LAST_SMOOTH_GB[0] = float(total_iters) * solver.gb_per_iter
    return jnp.concatenate(outs, axis=1), stats


def _stage_smooth(arrays: ProblemArrays, s_weight, config: FlowConfig,
                  vcoarse=None, vpatch=None):
    _LAST_SMOOTH_GB[0] = None
    from meshopticalflow_tpu.kernels.pallas_spmv import resolve_flow_backend
    backend = resolve_flow_backend(config.flow_backend, arrays.signals.dtype)
    if vcoarse is not None and vpatch is not None and backend == "pallas":
        from meshopticalflow_tpu.solvers.pallas_mg import BandedBreakdownError
        solver, b = _vertex_pallas_solver(arrays, vcoarse, vpatch, s_weight)
        try:
            return _stage_smooth_pallas(arrays, config, solver, b)
        except BandedBreakdownError:
            # Deferred c1 check failed at every shift mid-solve: rebuild
            # with the dense-patch coarsest (the pre-round-4 eager path's
            # fallback) and redo the stage.
            solver, b = _vertex_pallas_solver(arrays, vcoarse, vpatch,
                                              s_weight, force_dense=True)
            return _stage_smooth_pallas(arrays, config, solver, b)
    if vcoarse is not None:
        from meshopticalflow_tpu.flow.signal import _smooth_system
        sys_vals, b, diag = _smooth_system(arrays.smooth_ops, arrays.signals, s_weight)
        c_vals = vcoarse.m0_vals + s_weight * vcoarse.k0_vals
        if vpatch is not None:
            from meshopticalflow_tpu.solvers.mg3 import ThreeLevelSolver
            dt = arrays.signals.dtype
            a2 = (jnp.asarray(vpatch.m2_dense, dt)
                  + s_weight * jnp.asarray(vpatch.k2_dense, dt))
            solver = ThreeLevelSolver(arrays.smooth_ops.cols, sys_vals, diag,
                                      vcoarse.cols0, c_vals, vcoarse.p0_idx,
                                      vcoarse.p0_wt, a2, vpatch.p12_idx,
                                      vpatch.p12_wt)
        else:
            from meshopticalflow_tpu.solvers.twolevel import TwoLevelSolver
            solver = TwoLevelSolver(arrays.smooth_ops.cols, sys_vals, diag,
                                    vcoarse.cols0, c_vals, vcoarse.p0_idx,
                                    vcoarse.p0_wt)
        return solver.solve(b, x0=arrays.signals, tol=config.cg_tol,
                            max_iters=min(config.cg_max_iters, 200),
                            b_norm2=_smooth_bnorm2(arrays.signals, b, "xla"))
    return smooth_signal(arrays.smooth_ops, arrays.signals, s_weight,
                         tol=config.cg_tol, max_iters=config.cg_max_iters)


@functools.partial(jax.jit, static_argnames=("min_step", "max_steps"))
def _trace_pair(tm: TraceMesh, tfield, dtype_probe, min_step, max_steps):
    """Barycenter lanes advected by -1/2 (first half) and +1/2 (second).
    Returns (t1, p1, exhausted-lane count)."""
    t_count = tm.n_triangles
    t0 = jnp.tile(jnp.arange(t_count, dtype=jnp.int32), 2)
    p0 = jnp.full((2 * t_count, 2), 1.0 / 3.0, dtype_probe.dtype)
    times = jnp.concatenate([jnp.full(t_count, -0.5, dtype_probe.dtype),
                             jnp.full(t_count, 0.5, dtype_probe.dtype)])
    from meshopticalflow_tpu.kernels.tracing import flow_field_trace
    return flow_field_trace(tm, tfield, times, t0, p0, min_step, max_steps,
                            with_diagnostics=True)


def _advected_vertex_signals(arrays: ProblemArrays, smoothed, t1, p1):
    """Shared resample stage: sample both smoothed signals at the advected
    barycenter endpoints (t1, p1) — first half marched -1/2, second +1/2 —
    and push the per-triangle values back to vertices by segment mean
    (ResampleSignal, OpticalFlow.cpp:197-260).  Returns (V, 2C): columns
    [:C] = signal 0 advected forward, [C:] = signal 1 advected backward."""
    c = arrays.signals.shape[1] // 2
    t_count = arrays.tm.n_triangles
    sampled = sample_vertex_signal(arrays.tm.triangles, smoothed, t1, p1)
    from meshopticalflow_tpu.utils.compat import concat_columns
    both = concat_columns(sampled[:t_count, :c], sampled[t_count:, c:])
    flat_idx = arrays.tm.triangles.ravel()
    out = jax.ops.segment_sum(jnp.repeat(both, 3, axis=0), flat_idx,
                              num_segments=smoothed.shape[0])
    counts = jax.ops.segment_sum(jnp.ones_like(flat_idx, smoothed.dtype), flat_idx,
                                 num_segments=smoothed.shape[0])
    return out / jnp.maximum(counts, 1.0)[:, None]


@jax.jit
def _dataterm_from_samples(arrays: ProblemArrays, smoothed, t1, p1):
    c = arrays.signals.shape[1] // 2
    resampled = _advected_vertex_signals(arrays, smoothed, t1, p1)
    res0, res1 = resampled[:, :c], resampled[:, c:]
    d_blocks, rhs_t = data_term_blocks(arrays.tm.triangles, arrays.area, res0, res1)
    diff = res1 - res0
    mdiff = ell_matvec(arrays.smooth_ops.cols, arrays.smooth_ops.mass_vals, diff)
    align_err = jnp.sum(diff * mdiff)
    return d_blocks, rhs_t, align_err


def _stage_resample(arrays: ProblemArrays, tfield, smoothed, config: FlowConfig,
                    compact: bool = False):
    """Advect both smoothed signals by -1/2 / +1/2 and build the data term
    plus the alignment-error diagnostic (OpticalFlow.cpp:439-470, 1012-1023).
    Returns (d_blocks, rhs_t, align_err, exhausted, (t1, p1)).

    The tracing while_loop runs as its OWN dispatch: on the experimental
    axon TPU backend, fusing it with the downstream gather/segment-sum graph
    miscompiles (lane results differ from the standalone loop).

    ``compact`` routes the trace through the compacted driver with cap
    ESCALATION (kernels/advect.py): straggler lanes march past
    flow_max_steps in small compacted batches instead of freezing mid-path
    (single-device runs only — sharded runs keep the one-dispatch loop)."""
    if compact:
        from meshopticalflow_tpu.kernels.advect import flow_field_trace_compacted
        t_count = arrays.tm.n_triangles
        t0 = jnp.tile(jnp.arange(t_count, dtype=jnp.int32), 2)
        p0 = jnp.full((2 * t_count, 2), 1.0 / 3.0, smoothed.dtype)
        times = jnp.concatenate([jnp.full(t_count, -0.5, smoothed.dtype),
                                 jnp.full(t_count, 0.5, smoothed.dtype)])
        t1, p1, exhausted = flow_field_trace_compacted(
            arrays.tm, tfield, times, t0, p0, config.flow_min_step,
            config.flow_max_steps)
    else:
        t1, p1, exhausted = _trace_pair(arrays.tm, tfield, smoothed,
                                        config.flow_min_step, config.flow_max_steps)
    d_blocks, rhs_t, align_err = _dataterm_from_samples(arrays, smoothed, t1, p1)
    return d_blocks, rhs_t, align_err, exhausted, (t1, p1)


@jax.jit
def _resampled_signals(arrays: ProblemArrays, smoothed, t1, p1):
    """The advected comparison signals as per-vertex fields (V, 2C) — the
    ``resampled`` arrays the reference dumps under --debug
    (OpticalFlow.cpp:458-465)."""
    return _advected_vertex_signals(arrays, smoothed, t1, p1)


_SCHED_CFG_DIGESTS: dict = {}


def _sched_cfg_digest(config) -> str:
    """Short stable digest of the frozen FlowConfig for schedule-pin keys
    (config is hashable; repr of a frozen dataclass is deterministic)."""
    d = _SCHED_CFG_DIGESTS.get(config)
    if d is None:
        from meshopticalflow_tpu.utils.artifacts import key_of

        d = key_of("schedcfg", repr(config))[:8]
        _SCHED_CFG_DIGESTS[config] = d
    return d


def _stage_solve(arrays: ProblemArrays, coeffs, d_blocks, rhs_t, v_weight,
                 config: FlowConfig, coarse=None, patch=None, x0=None,
                 device_mesh=None, sched_key=None, nd=None):
    return update_optical_flow(arrays.basis, coeffs, d_blocks, rhs_t, v_weight,
                               sched_key=sched_key, nd=nd,
                               cg_tol=config.cg_tol, cg_max_iters=config.cg_max_iters,
                               use_host_cholesky=config.use_host_cholesky,
                               refine=config.flow_refine, coarse=coarse,
                               patch=patch if config.flow_mg_levels >= 3 else None,
                               backend=config.flow_backend,
                               mg_cheb_k=config.mg_cheb_k,
                               mg_coarse_exact=config.mg_coarse_exact,
                               mg_c1_bf16=config.mg_c1_bf16,
                               mg_nu=config.mg_nu,
                               mg_fine_cheb=config.mg_fine_cheb,
                               refine_tol=config.flow_refine_tol,
                               refine_floor=config.flow_refine_floor,
                               x0=x0, device_mesh=device_mesh)


@jax.jit
def _pack_level_scalars(*vals):
    """Stack the level's diagnostic scalars into one fetchable vector.
    The widest input dtype wins (f64 on the CPU-oracle paths keeps the
    alignment error at full precision; TPU runs are f32 throughout)."""
    dt = jnp.result_type(jnp.float32, *[jnp.asarray(v).dtype for v in vals])
    return jnp.stack([jnp.asarray(v).astype(dt) for v in vals])


def _level_step(arrays: ProblemArrays, coeffs, tfield, s_weight, v_weight,
                config: FlowConfig, coarse=None, vcoarse=None, patch=None,
                vpatch=None, want_resampled: bool = False,
                compact_trace: bool = False, warm_x=None, device_mesh=None,
                level: int | None = None, nd=None):
    """One UpdateFlow level (OpticalFlow.cpp:423-474): chunked-PCG smoothing,
    one jitted advect+data-term stage, two-level-MG (or chunked-PCG) flow
    solve. ``want_resampled`` additionally returns the advected per-vertex
    signals (for --debug dumps)."""
    # Approximate per-stage walls (observability, VERDICT r2 weak #9).
    # Caveat: per-dispatch wall timing under-reads on the tunneled axon
    # runtime (block_until_ready can return early), so these are stage
    # ATTRIBUTION hints, not precise device times; the level total is
    # measured around a host fetch and is reliable.
    _t0 = time.time()
    smoothed, sm_stats = _stage_smooth(arrays, s_weight, config, vcoarse, vpatch)
    _t1 = time.time()
    d_blocks, rhs_t, align_err, exhausted, (t1, p1) = _stage_resample(
        arrays, tfield, smoothed, config, compact=compact_trace)
    _t2 = time.time()
    resampled = _resampled_signals(arrays, smoothed, t1, p1) if want_resampled else None
    # The schedule pin key carries a config digest alongside the level:
    # persisted schedules (models/base._sched_disk_key) must not be shared
    # across configs that shape the level systems differently (weights,
    # cycle parameters) — a same-mesh run with other flags would otherwise
    # thrash the same disk record with guaranteed first-replay misses.
    new_coeffs, new_tfield, cg_stats = _stage_solve(arrays, coeffs, d_blocks, rhs_t,
                                                    v_weight, config, coarse, patch,
                                                    x0=warm_x,
                                                    device_mesh=device_mesh,
                                                    sched_key=(level,
                                                               _sched_cfg_digest(config)),
                                                    nd=nd)
    _t3 = time.time()
    from meshopticalflow_tpu.models.base import LAST_FLOW_SOLVE
    from meshopticalflow_tpu.solvers.refine import _LAST_ROUNDS
    # One batched fetch for the level's diagnostic scalars: fetching them
    # one by one from the metrics dict cost ~6 sequential tunnel round
    # trips per level (each a ~50-100 ms RTT on the tunneled runtime).
    packed = np.asarray(_pack_level_scalars(
        sm_stats.iterations, sm_stats.rel_residual, cg_stats.iterations,
        cg_stats.rel_residual, exhausted, align_err))
    metrics = dict(
        smooth_iters=float(packed[0]), smooth_res=float(packed[1]),
        flow_iters=float(packed[2]), flow_res=float(packed[3]),
        trace_exhausted=float(packed[4]),
        smooth_seconds=_t1 - _t0, trace_seconds=_t2 - _t1,
        solve_seconds=_t3 - _t2,
        alignment_error=float(packed[5]))
    # Effective HBM bandwidth of the Pallas solves (streamed-GB model /
    # stage wall): a bandwidth regression — host round trips sneaking into
    # the loop, a de-optimized kernel — shows up here without a profiler.
    if LAST_FLOW_SOLVE.get("gb") is not None:
        metrics["flow_gb"] = LAST_FLOW_SOLVE["gb"]
        metrics["flow_eff_gbps"] = LAST_FLOW_SOLVE["gb"] / max(_t3 - _t2, 1e-9)
    if _LAST_SMOOTH_GB[0] is not None:
        metrics["smooth_eff_gbps"] = _LAST_SMOOTH_GB[0] / max(_t1 - _t0, 1e-9)
    if _LAST_ROUNDS[0]:
        metrics["flow_rounds"] = _format_rounds(_LAST_ROUNDS[0])
    return new_coeffs, new_tfield, metrics, resampled


@functools.partial(jax.jit, static_argnames=("min_step", "max_steps"))
def _advect_colors_jit(tm: TraceMesh, tfield, colors, length, min_step, max_steps):
    return resample_signal(tm, tfield, colors, length, min_step, max_steps)


@functools.partial(jax.jit, static_argnames=("min_step", "max_steps", "bilinear"))
def _advect_texture_jit(tm: TraceMesh, tfield, tri_uvs, texture, src_t, src_p,
                        length, min_step, max_steps, bilinear):
    colors = advect_texture(tm, tfield, tri_uvs, texture, src_t, src_p, length,
                            min_step, max_steps, bilinear)
    base = jnp.flipud(texture).reshape(-1, texture.shape[-1])
    return jnp.where((src_t >= 0)[:, None], colors, base)


@functools.partial(jax.jit, static_argnames=("min_step", "max_steps", "bilinear"))
def _advect_texture_step_jit(tm: TraceMesh, tfield, tri_uvs, texture, src_t, src_p,
                             length, min_step, max_steps, bilinear):
    from meshopticalflow_tpu.kernels.advect import advect_texture_step
    colors, t1, p1 = advect_texture_step(tm, tfield, tri_uvs, texture, src_t, src_p,
                                         length, min_step, max_steps, bilinear)
    base = jnp.flipud(texture).reshape(-1, texture.shape[-1])
    return jnp.where((src_t >= 0)[:, None], colors, base), t1, p1


@jax.jit
def _advect_order_jit(src_t, src_p):
    """Triangle-coherent march order + the reordered texel tables, all on
    device (see FlowProblem._ensure_advect_order)."""
    order = jnp.argsort(src_t).astype(jnp.int32)
    return order, src_t[order], src_p[order]


@jax.jit
def _halfway_lanes(src_t_sorted, src_p_sorted, t_back, t_fwd):
    """Both textures' march lanes (start states + per-lane flow times) in
    one dispatch (was three eager concats per output call). The two flow
    times arrive precomputed in host f64 (t_fwd = 1 - alpha BEFORE the f32
    cast) so their rounding matches the two-pass path bit for bit."""
    t2 = jnp.concatenate([src_t_sorted, src_t_sorted])
    p2 = jnp.concatenate([src_p_sorted, src_p_sorted])
    n = src_t_sorted.shape[0]
    times = jnp.concatenate([jnp.full(n, t_back, t_back.dtype),
                             jnp.full(n, t_fwd, t_back.dtype)])
    return t2, p2, times


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _halfway_tail(c0, c1, order, src_t, tex0, tex1, h: int, w: int):
    """Scatter the sampled colors back to raster order, fill unclaimed
    texels with the input blend, and blend + clip + uint8-quantize — one
    dispatch. Same float ops as the eager chain it replaces (adds and a
    divide: no FMA-contractible pattern), so the output stays bit-identical
    to blending the two advected float textures on host."""
    accum_s = c0 + c1
    accum = jnp.zeros_like(accum_s).at[order].set(accum_s)
    base = (jnp.flipud(tex0) + jnp.flipud(tex1)).reshape(-1, 3)
    accum = jnp.where((src_t >= 0)[:, None], accum, base)
    blend = (accum / 2.0).reshape(h, w, 3)
    return jnp.clip(blend, 0, 255).astype(jnp.uint8)


@jax.jit
def _scatter_remapped(src_t, src_p, idx, t1, p1):
    """Scatter the exp-remapped texels back into the device sample table in
    ONE dispatch (two eager .at[].set calls measured ~3.3 s of dispatch
    overhead on the tunneled runtime)."""
    return src_t.at[idx].set(t1), src_p.at[idx].set(p1)


@jax.jit
def _exp_remap_jit(tm: TraceMesh, t0, p):
    center = jnp.full_like(p, 1.0 / 3.0)
    # with_diagnostics also surfaces cap-exhausted lanes; measured healthy at
    # ~1 s for the 2K atlas's 16.5k remap lanes (the prior diagnostics-free
    # compiled program stalled the axon runtime for minutes — see
    # PROGRESS.md quirks).
    return exp_map(tm, t0, center, p - center, with_diagnostics=True)


# ----------------------------------------------------------------------------
# Host orchestration
# ----------------------------------------------------------------------------

def _host_sample_texture(texture: np.ndarray, uv: np.ndarray, bilinear: bool) -> np.ndarray:
    """numpy clone of the reference texture fetch (MeshFlow.inl:65-84)."""
    h, w = texture.shape[:2]
    tex = texture.astype(np.float64)
    x = np.clip(uv[:, 0], 0, 1) * (w - 1)
    y = np.clip(1.0 - uv[:, 1], 0, 1) * (h - 1)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    if not bilinear:
        return tex[y0, x0]
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    dx, dy = (x - x0)[:, None], (y - y0)[:, None]
    return (tex[y0, x0] * (1 - dx) * (1 - dy) + tex[y0, x1] * dx * (1 - dy)
            + tex[y1, x1] * dx * dy + tex[y1, x0] * (1 - dx) * dy)


def sample_texture_to_vertices(triangles: np.ndarray, uvs: np.ndarray,
                               texture: np.ndarray, n_vertices: int,
                               bilinear: bool = True) -> np.ndarray:
    """Per-wedge texture average into vertex colors (MeshFlow.inl:251-266)."""
    samples = _host_sample_texture(texture, uvs.reshape(-1, 2), bilinear)
    colors = np.zeros((n_vertices, 3))
    counts = np.zeros(n_vertices)
    np.add.at(colors, triangles.ravel(), samples)
    np.add.at(counts, triangles.ravel(), 1.0)
    return colors / np.maximum(counts, 1)[:, None]


class FlowProblem:
    """A prepared optical-flow problem: device arrays + cached jitted stages."""

    def __init__(
        self,
        config: FlowConfig,
        mesh: HostMesh,
        signals: np.ndarray,               # (2, V, 3) raw input signals
        vertices: Optional[np.ndarray] = None,
        texture_source: Optional[TextureSource] = None,
        tri_uvs: Optional[np.ndarray] = None,
        textures: Optional[np.ndarray] = None,       # (2, H, W, 3) uint8
        vertex_colors: Optional[np.ndarray] = None,  # (2, V, 3)
        cache_key: Optional[str] = None,
        device_mesh=None,   # jax.sharding.Mesh: run the SAME pipeline sharded
        defer_signals: bool = False,  # preprocess after the MG hierarchy exists
        signals_key: Optional[str] = None,  # artifact key for the preprocessed signals
    ):
        enable_persistent_cache()
        # Establish the device->host result channel while the tunnel is
        # quiet: the FIRST d2h fetch of a compute result in a process wedges
        # the tunneled runtime for minutes when it races the init upload
        # burst (observed at four different fetch sites across bench runs).
        float(jnp.add(jnp.ones(()), jnp.ones(())))
        if device_mesh is not None and config.flow_backend == "mf":
            # The multifrontal direct solve is single-device by design (the
            # depth-sweep extend-add chains every front batch through its
            # parent — the wrong shape for cross-device sharding at this
            # front size). Refuse loudly instead of silently degrading
            # (VERDICT r4 next #8); sharded runs use the halo-exchange MG.
            raise ValueError(
                "flow_backend='mf' is single-device only; use "
                "flow_backend='halo' (ppermute halo-exchange MG-PCG) or "
                "'auto' for sharded runs")
        if device_mesh is not None and config.flow_backend != "halo":
            # GSPMD shards the jitted stages; the Pallas kernels are
            # single-device, so multi-chip runs use the XLA operator path —
            # or, opt-in, flow_backend="halo": the halo-exchange sharded
            # form of the production 2-level cycle (parallel/halo.py).
            config = dataclasses.replace(config, flow_backend="xla")
        self.device_mesh = device_mesh
        self.config = config
        self.mesh = mesh
        self._cache_key = cache_key
        self._signals_key = signals_key
        self.init_profile: Dict[str, float] = {}
        _t = time.time()

        def _mark(name):
            nonlocal _t
            self.init_profile[name] = round(time.time() - _t, 2)
            _t = time.time()

        if (np.dtype(config.dtype) == np.float64
                and not jax.config.read("jax_enable_x64")):
            # A float64 problem without x64 would silently truncate every
            # array to f32 (jnp warns once and proceeds). The test suite
            # runs the f32 path WITH x64 enabled, so flipping it on here
            # changes nothing for f32 configs.
            jax.config.update("jax_enable_x64", True)
        dtype = jnp.dtype(config.dtype)
        self.dtype = dtype
        # Device-state reuse across constructions of the SAME problem
        # (utils/devcache.py; VERDICT r4 next #4): keyed by the artifact
        # identity, bypassed for ad-hoc problems (no cache key) and sharded
        # runs (placement is per-mesh).
        from meshopticalflow_tpu.utils.devcache import get_or_build
        _dev_reuse = cache_key is not None and device_mesh is None \
            and config.artifact_cache

        def _devkey(*parts):
            return (cache_key, str(dtype)) + parts if _dev_reuse else None

        tm, smooth_ops = get_or_build(
            _devkey("tables"),
            lambda: (make_trace_mesh(mesh, dtype),
                     make_smoothing_operators(mesh, dtype)))
        _mark("device_tables")
        self.basis_host, basis = self._build_basis_cached(mesh, config)
        _mark("basis")
        self.vertices = vertices

        # The DoG preprocessing solve wants the vertex MG hierarchy, which is
        # attached after construction — defer it when the caller will attach.
        self._signals_raw = jnp.asarray(signals, dtype)
        self._signals_ready = False
        placeholder = jnp.zeros((self._signals_raw.shape[1], 2 * config.channels),
                                dtype)
        self.arrays = ProblemArrays(tm=tm, smooth_ops=smooth_ops, basis=basis,
                                    signals=placeholder,
                                    area=jnp.asarray(mesh.area, dtype))
        if not defer_signals:
            self._ensure_signals()
        _mark("preprocess_signals")

        self.texture_source = texture_source
        # Upload the u8 pixels (12.5 MB each at 2K) and cast on DEVICE —
        # a float32 host cast would quadruple the tunnel upload bytes.
        # The uploads are ASYNC by default: their only consumers are the
        # output/advection stage ~30 s of level solves later, and the tunnel
        # moves h2d at ~16 MB/s (measured: 6.2 s + 6.4 s BLOCKED at 4K), so
        # letting the DMA ride under the level dispatches is free wall time.
        # MESHFLOW_SYNC_INIT=1 restores the blocking waits so init_profile
        # attributes transfer cost precisely (otherwise the upload entries
        # time the host-side enqueue only).
        _sync_init = os.environ.get("MESHFLOW_SYNC_INIT", "") == "1"

        def _settle(x):
            if _sync_init and x is not None:
                x.block_until_ready()

        _texkey = (signals_key,) if signals_key else ()
        self.textures = None if textures is None else get_or_build(
            _devkey("textures", *_texkey),
            lambda: jnp.asarray(textures).astype(dtype))
        self.tri_uvs = None if tri_uvs is None else jnp.asarray(tri_uvs, dtype)
        self.vertex_colors = None if vertex_colors is None else jnp.asarray(vertex_colors, dtype)
        _settle(self.textures)
        _mark("texture_upload")
        if texture_source is not None:
            def _build_texel_table():
                self.src_t = jnp.asarray(texture_source.tri_idx)
                self.src_p = jnp.asarray(texture_source.bary, dtype)
                _settle(self.src_p)
                _mark("texel_table_upload")
                self._exp_remap_texels(_settle)
                return (self.src_t, self.src_p,
                        getattr(self, "_exp_exhausted", None))

            # Keyed by the atlas dimensions (like the texsrc_host disk key):
            # a texel COUNT alone can collide across W×H layouts of the
            # same mesh and serve tables with the wrong pixel indexing.
            self.src_t, self.src_p, self._exp_exhausted = get_or_build(
                _devkey("texsrc", config.pad_radius,
                        int(texture_source.width),
                        int(texture_source.height)),
                _build_texel_table)
        _mark("exp_remap")
        self.coeffs = jnp.zeros(basis.n_coeffs, dtype)
        self.tfield = jnp.zeros((mesh.n_triangles, 2), dtype)
        if device_mesh is not None:
            self._place_on_mesh(device_mesh)
            _mark("shard_placement")
        self.coarse = None
        self.vcoarse = None
        self.patch = None
        self.vpatch = None
        self.nd = None

    def _ensure_nd(self):
        """Build the multifrontal direct-solve context once per problem
        (flow_backend="mf"): nested-dissection symbolic analysis on the
        level-invariant flow pattern (disk-cached) + one device upload of
        the per-depth index tables. Single-device runs only — sharded runs
        keep the iterative halo/GSPMD paths. Needs the vertex embedding for
        the inertial bisection; problems constructed without vertices fall
        back to MG."""
        if self.nd is not None:
            return self.nd
        if (self.config.flow_backend != "mf" or self.device_mesh is not None
                or self.vertices is None):
            return None
        from meshopticalflow_tpu.solvers.multifrontal import build_nd_context
        from meshopticalflow_tpu.utils.artifacts import key_of
        cfg = self.config
        ck = key_of("ndpack", self._cache_key, int(cfg.vf_mode),
                    int(cfg.connection_mode), cfg.divergence_free, 64) \
            if (self._cache_key and cfg.artifact_cache) else ""
        _t0 = time.time()
        basis = self.arrays.basis
        from meshopticalflow_tpu.utils.devcache import get_or_build
        self.nd = get_or_build(
            ("nd_dev", ck) if ck else None,
            lambda: build_nd_context(
                self.mesh.triangles, self.vertices, self.basis_host.p_idx,
                basis.ell_cols, basis.n_coeffs, diag_slot=basis.diag_slot,
                leaf=64, cache_key=ck))
        self.init_profile["nd_pack"] = round(time.time() - _t0, 2)
        return self.nd

    def _ensure_signals(self) -> None:
        """Run the comparison-signal preprocessing (idempotent), using the
        vertex MG hierarchy when attached."""
        if self._signals_ready:
            return
        import time as _time
        _t0 = _time.time()
        cfg = self.config
        key = ""
        if self._signals_key and cfg.artifact_cache and cfg.dog_weight > 0:
            # The preprocessed signals contain an iterative-solve result, so
            # the key pins everything that shapes it — including the
            # platform (a CPU test run must not consume TPU-solved bands,
            # and vice versa).
            from meshopticalflow_tpu.utils.artifacts import key_of
            key = key_of("sigpre", self._signals_key, cfg.dog_weight,
                         cfg.dog_smooth, cfg.log_space, cfg.channels,
                         cfg.dtype, cfg.cg_tol, cfg.flow_backend, cfg.nearest,
                         jax.default_backend(),
                         getattr(self, "vcoarse", None) is not None,
                         getattr(self, "vpatch", None) is not None)
        if key:
            from meshopticalflow_tpu.utils.artifacts import cached
            from meshopticalflow_tpu.utils.devcache import get_or_build

            def compute():
                sig_ = _preprocess_signals(self.arrays.smooth_ops,
                                           self._signals_raw, cfg,
                                           getattr(self, "vcoarse", None),
                                           getattr(self, "vpatch", None))
                return dict(sig=np.asarray(sig_))

            sig = get_or_build(
                ("sig_dev", key, str(self.dtype))
                if self.device_mesh is None else None,
                lambda: jnp.asarray(cached("sigpre", key, compute)["sig"],
                                    self.dtype))
        else:
            # No cache: keep the result on device (no d2h round trip).
            sig = _preprocess_signals(self.arrays.smooth_ops,
                                      self._signals_raw, cfg,
                                      getattr(self, "vcoarse", None),
                                      getattr(self, "vpatch", None))
        sig.block_until_ready()
        if self.device_mesh is not None and \
                sig.shape[0] % self.device_mesh.devices.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sig = jax.device_put(sig, NamedSharding(
                self.device_mesh, P(self.device_mesh.axis_names[0])))
        self.arrays = self.arrays.replace(signals=sig)
        self._signals_ready = True
        self.init_profile["preprocess_solve"] = round(_time.time() - _t0, 2)

    def _place_on_mesh(self, device_mesh) -> None:
        """Place the problem arrays over a device mesh (SURVEY.md section
        2.7): big row-indexed arrays (ELL operators, signals, texel lanes)
        shard on the leading axis; trace tables and small arrays replicate.
        GSPMD then inserts the collectives (all-gathers for x[cols], psum
        for CG dots) in the SAME jitted stages single-chip runs use."""
        from meshopticalflow_tpu.parallel.sharding import level_step_shardings

        spec = level_step_shardings(device_mesh, self.arrays)
        self.arrays = jax.device_put(self.arrays, spec)
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(device_mesh, P())
        lane = NamedSharding(device_mesh, P(device_mesh.axis_names[0]))
        self.coeffs = jax.device_put(self.coeffs, rep)
        self.tfield = jax.device_put(self.tfield, rep)
        n = device_mesh.devices.size
        if self.texture_source is not None and self.src_t.shape[0] % n == 0:
            self.src_t = jax.device_put(self.src_t, lane)
            self.src_p = jax.device_put(
                self.src_p, NamedSharding(device_mesh,
                                          P(device_mesh.axis_names[0], None)))

    def _build_basis_cached(self, mesh: HostMesh, config: FlowConfig):
        """build_basis through the artifact cache (utils/artifacts.py)."""
        from meshopticalflow_tpu.models.base import BasisDevice, BasisHost
        from meshopticalflow_tpu.utils.artifacts import cached, key_of

        if not (self._cache_key and config.artifact_cache):
            return build_basis(mesh, config)
        bk = key_of("basis", self._cache_key, int(config.vf_mode),
                    int(config.connection_mode), config.divergence_free)
        if self.device_mesh is None:
            from meshopticalflow_tpu.utils.devcache import get_or_build
            return get_or_build(("basis_dev", bk, str(self.dtype)),
                                lambda: self._build_basis_uncached(mesh, bk))
        return self._build_basis_uncached(mesh, bk)

    def _build_basis_uncached(self, mesh: HostMesh, bk: str):
        from meshopticalflow_tpu.models.base import BasisDevice, BasisHost
        from meshopticalflow_tpu.utils.artifacts import cached
        config = self.config

        def compute():
            host, dev = build_basis(mesh, config)
            return dict(name=np.frombuffer(host.name.encode(), np.uint8),
                        n_coeffs=np.asarray(host.n_coeffs),
                        p_idx=host.p_idx, p_wt=host.p_wt, smooth=host.smooth,
                        ell_cols=np.asarray(dev.ell_cols),
                        s_vals=np.asarray(dev.s_vals, np.float64),
                        diag_slot=np.asarray(dev.diag_slot),
                        dt_slots=np.asarray(dev.dt_slots))

        d = cached("basis", bk, compute)
        from meshopticalflow_tpu.models.base import BasisHost as BH
        host = BH(bytes(d["name"]).decode(), int(d["n_coeffs"]), d["p_idx"],
                  d["p_wt"], d["smooth"])
        dev = BasisDevice(
            p_idx=jnp.asarray(d["p_idx"], jnp.int32),
            p_wt=jnp.asarray(d["p_wt"], self.dtype),
            ell_cols=jnp.asarray(d["ell_cols"], jnp.int32),
            s_vals=jnp.asarray(d["s_vals"], self.dtype),
            diag_slot=jnp.asarray(d["diag_slot"], jnp.int32),
            dt_slots=jnp.asarray(d["dt_slots"], jnp.int32),
            n_coeffs=int(d["n_coeffs"]))
        return host, dev

    def attach_coarse_space(self, tris0, verts0, parent, bary) -> None:
        """Build the two-level geometric coarse spaces (models/coarse.py)
        from subdivision parent tracking: one for the flow basis, one for
        the scalar smoothing solves. Served from the artifact cache."""
        from meshopticalflow_tpu.config import VectorFieldMode
        from meshopticalflow_tpu.models.base import BasisDevice, BasisHost, finalize_basis
        from meshopticalflow_tpu.models.coarse import (
            CoarseSpace, PatchLevel, VertexCoarse, VertexPatchLevel,
            build_coarse_space, build_patch_level, build_vertex_coarse,
            build_vertex_patch_level_from)
        from meshopticalflow_tpu.utils.artifacts import cached, key_of

        cfg = self.config
        whitney = VectorFieldMode(cfg.vf_mode) == VectorFieldMode.WHITNEY

        def compute():
            coarse_mesh = build_mesh(tris0, vertices=verts0)
            cs = build_coarse_space(cfg, self.mesh, self.basis_host,
                                    coarse_mesh, parent, bary)
            vc = build_vertex_coarse(cfg, self.mesh, coarse_mesh, parent, bary)
            out = dict(
                ch_name=np.frombuffer(cs.coarse_host.name.encode(), np.uint8),
                ch_n=np.asarray(cs.coarse_host.n_coeffs),
                ch_p_idx=cs.coarse_host.p_idx, ch_p_wt=cs.coarse_host.p_wt,
                ch_smooth=cs.coarse_host.smooth,
                cd_ell_cols=np.asarray(cs.coarse_dev.ell_cols),
                cd_s_vals=np.asarray(cs.coarse_dev.s_vals, np.float32),
                cd_diag_slot=np.asarray(cs.coarse_dev.diag_slot),
                cd_dt_slots=np.asarray(cs.coarse_dev.dt_slots),
                p0=cs.p0, p0_idx=cs.p0_idx, p0_wt=cs.p0_wt,
                vc_cols0=np.asarray(vc.cols0),
                vc_m0=np.asarray(vc.m0_vals, np.float32),
                vc_k0=np.asarray(vc.k0_vals, np.float32),
                vc_p0_idx=np.asarray(vc.p0_idx), vc_p0_wt=np.asarray(vc.p0_wt, np.float64),
                vc_m0_csr=vc.m0_csr, vc_k0_csr=vc.k0_csr,
                has_patch=np.asarray(whitney))
            if whitney:
                pl_, patch_ids = build_patch_level(cfg, coarse_mesh, cs)
                vp = build_vertex_patch_level_from(cfg, vc.m0_csr, vc.k0_csr,
                                                   coarse_mesh, patch_ids)
                # float32: every consumer casts to the device dtype anyway,
                # and it halves the cached npz (the s2 dense block alone is
                # 200 MB in f64).
                out.update(
                    q2_idx=np.asarray(pl_.q2_idx), q2_wt=np.asarray(pl_.q2_wt, np.float32),
                    s2=np.asarray(pl_.s2_dense, np.float32),
                    p12_idx=np.asarray(pl_.p12_idx), p12_wt=np.asarray(pl_.p12_wt, np.float32),
                    vp_m2=np.asarray(vp.m2_dense, np.float32),
                    vp_k2=np.asarray(vp.k2_dense, np.float32),
                    vp_p12_idx=np.asarray(vp.p12_idx),
                    vp_p12_wt=np.asarray(vp.p12_wt, np.float32))
            return out

        use_cache = bool(self._cache_key and cfg.artifact_cache)
        ck = key_of("coarse", self._cache_key, int(cfg.vf_mode),
                    int(cfg.connection_mode), cfg.divergence_free) \
            if use_cache else ""
        # The dense patch-coarsest blocks are FALLBACK-only under the
        # banded-exact coarse solve — defer their (~200 MB) payload reads
        # to first use (utils/artifacts.LazyNpzArray).
        from meshopticalflow_tpu.kernels.pallas_spmv import resolve_flow_backend
        backend = resolve_flow_backend(cfg.flow_backend, self.dtype)
        defer_dense = cfg.mg_coarse_exact and backend == "pallas" \
            and self.device_mesh is None

        def _build_handles():
            return self._coarse_handles_uncached(
                compute, ck, use_cache, defer_dense)

        _t0 = time.time()
        if use_cache and self.device_mesh is None:
            from meshopticalflow_tpu.utils.devcache import get_or_build
            # mg_coarse_exact is in the key independently of defer_dense:
            # it also decides whether the dense patch blocks stay host-side
            # (the `lazy` flag in _coarse_handles_uncached), so two configs
            # differing only in that flag must not share a handle set.
            handles = get_or_build(
                ("coarse_dev", ck, str(self.dtype), defer_dense,
                 bool(cfg.mg_coarse_exact)),
                _build_handles)
        else:
            handles = _build_handles()
        self.coarse, self.vcoarse, self.patch, self.vpatch = handles
        self.init_profile.setdefault("coarse_load",
                                     round(time.time() - _t0, 2))
        self.init_profile.setdefault("coarse_upload", 0.0)
        self._ensure_signals()

    def _coarse_handles_uncached(self, compute, ck, use_cache, defer_dense):
        """Load/assemble the coarse-space artifacts and upload the device
        handles (the devcache-able unit of attach_coarse_space)."""
        from meshopticalflow_tpu.models.base import BasisDevice, BasisHost
        from meshopticalflow_tpu.models.coarse import (
            CoarseSpace, PatchLevel, VertexCoarse, VertexPatchLevel)
        from meshopticalflow_tpu.utils.artifacts import cached, key_of

        cfg = self.config
        _t0 = time.time()
        d = cached("coarse", ck, compute, enabled=use_cache,
                   lazy_keys=("s2", "vp_m2", "vp_k2") if defer_dense else ())
        self.init_profile["coarse_load"] = round(time.time() - _t0, 2)

        dt = self.dtype
        ch = BasisHost(bytes(d["ch_name"]).decode(), int(d["ch_n"]),
                       d["ch_p_idx"], d["ch_p_wt"], d["ch_smooth"])
        cd = BasisDevice(
            p_idx=jnp.asarray(d["ch_p_idx"], jnp.int32),
            p_wt=jnp.asarray(d["ch_p_wt"], dt),
            ell_cols=jnp.asarray(d["cd_ell_cols"], jnp.int32),
            s_vals=jnp.asarray(d["cd_s_vals"], dt),
            diag_slot=jnp.asarray(d["cd_diag_slot"], jnp.int32),
            dt_slots=jnp.asarray(d["cd_dt_slots"], jnp.int32),
            n_coeffs=int(d["ch_n"]))
        coarse = CoarseSpace(ch, cd, d["p0"], d["p0_idx"], d["p0_wt"])
        vcoarse = VertexCoarse(
            cols0=jnp.asarray(d["vc_cols0"], jnp.int32),
            m0_vals=jnp.asarray(d["vc_m0"], dt),
            k0_vals=jnp.asarray(d["vc_k0"], dt),
            p0_idx=jnp.asarray(d["vc_p0_idx"], jnp.int32),
            p0_wt=jnp.asarray(d["vc_p0_wt"], dt),
            m0_csr=d["vc_m0_csr"], k0_csr=d["vc_k0_csr"])
        patch = None
        vpatch = None
        if bool(d["has_patch"]):
            # With the banded-exact coarse solve active the dense patch
            # blocks are a FALLBACK only: keep them host-side — possibly
            # still unread LazyNpzArray handles — instead of paying ~100 MB
            # of tunnel upload (and ~200 MB of disk read) at init.
            lazy = cfg.mg_coarse_exact
            as_dev = (lambda a, t=None: a) if lazy else \
                (lambda a, t=None: jnp.asarray(a, t or dt))
            patch = PatchLevel(
                q2_idx=jnp.asarray(d["q2_idx"], jnp.int32),
                q2_wt=jnp.asarray(d["q2_wt"], dt),
                s2_dense=as_dev(d["s2"]),
                p12_idx=jnp.asarray(d["p12_idx"], jnp.int32),
                p12_wt=jnp.asarray(d["p12_wt"], dt))
            if use_cache:
                # Lets the Pallas solvers serve their pattern packs from disk.
                patch.artifact_key = key_of(
                    "mgpack", self._cache_key, int(cfg.vf_mode),
                    int(cfg.connection_mode), cfg.divergence_free)
                vcoarse.artifact_key = key_of("vmgpack", self._cache_key)
            vpatch = VertexPatchLevel(
                m2_dense=as_dev(d["vp_m2"]),
                k2_dense=as_dev(d["vp_k2"]),
                p12_idx=jnp.asarray(d["vp_p12_idx"], jnp.int32),
                p12_wt=jnp.asarray(d["vp_p12_wt"], dt))
        self.init_profile["coarse_upload"] = round(
            time.time() - _t0 - self.init_profile["coarse_load"], 2)
        return coarse, vcoarse, patch, vpatch

    # -- construction ----------------------------------------------------

    @classmethod
    def from_texture_inputs(cls, mesh_path: str, texture_paths: Tuple[str, str],
                            config: FlowConfig,
                            device_mesh=None) -> "FlowProblem":
        """Texture-pair alignment setup (WhitneyFlowViewer::Init texture
        branch, OpticalFlow.cpp:684-752 + 818).

        Host geometry work (PLY parse, subdivision, EdgeXForm tables) is
        served from the per-mesh artifact cache (utils/artifacts.py)."""
        from meshopticalflow_tpu.utils.artifacts import cached, file_hash, key_of

        mesh_hash = file_hash(mesh_path)
        geo_key = key_of("geom", mesh_hash, config.subdivide_edge_length)

        def compute_geo():
            data = read_triangle_mesh(mesh_path)
            if data.face_uvs is None:
                raise ValueError(f"{mesh_path} has no texture coordinates")
            diag = float(np.linalg.norm(data.vertices.max(0) - data.vertices.min(0)))
            tris, verts, uvs = data.faces, data.vertices, data.face_uvs
            edge_len = config.subdivide_edge_length * diag
            out = dict(tris0=data.faces, verts0=data.vertices,
                       subdivided=np.asarray(edge_len > 0))
            if edge_len > 0:
                tris, verts, uvs, parent, bary = subdivide_tracked(
                    tris, verts, uvs, edge_len)
                out.update(parent=parent, bary=bary)
            mesh = build_mesh(tris, vertices=verts)
            out.update(tris=tris, verts=verts, uvs=uvs, g=mesh.g,
                       g_inv=mesh.g_inv, area=mesh.area, opp=mesh.opp,
                       xform_linear=mesh.xform_linear,
                       xform_const=mesh.xform_const,
                       n_vertices=np.asarray(mesh.n_vertices))
            return out

        from meshopticalflow_tpu.utils.devcache import get_or_build
        _t0 = time.time()
        # The geom npz read is ~100 MB of host arrays per construction; a
        # repeat construction of the same problem (bench draws, --serve,
        # track_sequence pairs) serves it from process memory.
        gd = get_or_build(
            ("geom_host", geo_key) if config.artifact_cache else None,
            lambda: cached("geom", geo_key, compute_geo,
                           enabled=config.artifact_cache))
        _geom_s = round(time.time() - _t0, 2)
        tris, verts, uvs = gd["tris"], gd["verts"], gd["uvs"]
        mesh = HostMesh(triangles=np.asarray(gd["tris"], np.int32), g=gd["g"],
                        g_inv=gd["g_inv"], area=gd["area"],
                        opp=np.asarray(gd["opp"], np.int32),
                        xform_linear=gd["xform_linear"],
                        xform_const=gd["xform_const"],
                        n_vertices=int(gd["n_vertices"]))
        coarse = None
        if bool(gd["subdivided"]):
            coarse = (gd["tris0"], gd["verts0"], gd["parent"], gd["bary"])

        tex0 = read_png_rgb(texture_paths[0])
        tex1 = read_png_rgb(texture_paths[1])
        if tex0.shape != tex1.shape:
            raise ValueError(f"texture shapes differ: {tex0.shape} vs {tex1.shape}")
        n_vertices = int(tris.max()) + 1
        _t0 = time.time()
        tex_hashes = (file_hash(texture_paths[0]), file_hash(texture_paths[1]))
        bake_key = key_of("bake", geo_key, *tex_hashes, config.nearest)
        signals = cached(
            "bake", bake_key,
            lambda: dict(signals=np.stack([
                sample_texture_to_vertices(tris, uvs, t, n_vertices,
                                           not config.nearest)
                for t in (tex0, tex1)])),
            enabled=config.artifact_cache)["signals"]
        _bake_s = round(time.time() - _t0, 2)
        h, w = tex0.shape[:2]
        _t0 = time.time()
        src = get_or_build(
            ("texsrc_host", geo_key, w, h, config.pad_radius)
            if config.artifact_cache else None,
            lambda: rasterize_texture_source(uvs, w, h, config.pad_radius))
        _raster_s = round(time.time() - _t0, 2)
        will_attach = coarse is not None and config.use_multigrid
        problem = cls(config, mesh, signals, vertices=verts, texture_source=src,
                      tri_uvs=uvs, textures=np.stack([tex0, tex1]),
                      cache_key=geo_key, defer_signals=will_attach,
                      device_mesh=device_mesh,
                      signals_key=key_of("sig", geo_key, *tex_hashes))
        problem.init_profile.update(geom=_geom_s, bake=_bake_s, raster=_raster_s)
        if will_attach:
            _t0 = time.time()
            problem.attach_coarse_space(*coarse)
            problem.init_profile["coarse"] = round(time.time() - _t0, 2)
        return problem

    @classmethod
    def from_vertex_inputs(cls, path0: str, path1: str, config: FlowConfig,
                           device_mesh=None) -> "FlowProblem":
        """Colored-PLY-pair setup (OpticalFlow.cpp:753-780): identical
        connectivity required; geometry is the average of the two."""
        m0 = read_triangle_mesh(path0)
        m1 = read_triangle_mesh(path1)
        if m0.vertices.shape != m1.vertices.shape:
            raise ValueError("vertex counts differ")
        if not np.array_equal(m0.faces, m1.faces):
            raise ValueError("triangle indices do not match")
        if m0.colors is None or m1.colors is None:
            raise ValueError("inputs must carry per-vertex colors")
        verts = (m0.vertices + m1.vertices) * 0.5
        mesh = build_mesh(m0.faces, vertices=verts)
        return cls(config, mesh, np.stack([m0.colors, m1.colors]), vertices=verts,
                   vertex_colors=np.stack([m0.colors, m1.colors]),
                   device_mesh=device_mesh)

    def _exp_remap_texels(self, settle=None) -> None:
        """Push out-of-triangle texels through the geodesic exp
        (RemapSamplePoint, MeshFlow.inl:339-350).  ``settle`` is the init
        profiler's optional blocking hook (MESHFLOW_SYNC_INIT); by default
        every step here just ENQUEUES and the device stream orders it
        before the first advection read."""
        src = self.texture_source
        mask = src.needs_remap
        if not mask.any():
            return
        settle = settle or (lambda x: None)
        idx = np.nonzero(mask)[0]
        _t = time.time()
        t_in = jnp.asarray(src.tri_idx[idx])
        p_in = jnp.asarray(src.bary[idx], self.dtype)
        settle(p_in)
        self.init_profile["exp_upload"] = round(time.time() - _t, 2)
        _t = time.time()
        t1, p1, exhausted = _exp_remap_jit(self.arrays.tm, t_in, p_in)
        settle(t1)
        self.init_profile["exp_dispatch"] = round(time.time() - _t, 2)
        # Scatter the remapped texels on DEVICE — the sample table stays
        # resident (the host texture_source keeps the pre-remap rasterizer
        # output; all advection reads src_t/src_p).
        _t = time.time()
        idx_dev = jnp.asarray(idx, jnp.int32)
        self.src_t, self.src_p = _scatter_remapped(self.src_t, self.src_p,
                                                   idx_dev, t1, p1)
        settle(self.src_t)
        self.init_profile["exp_scatter"] = round(time.time() - _t, 2)
        # Deferred fetch: scalar d2h reads at this point in init wedge the
        # tunneled runtime for minutes (observed repeatedly); the count is
        # reported with the level-0 metrics instead.
        self._exp_exhausted = exhausted

    # -- outer loop (IterativeOptimization, OpticalFlow.cpp:1035-1056) ---

    def run(self, verbose: bool = False, checkpoint_dir: Optional[str] = None,
            resume: bool = True, debug_dir: Optional[str] = None,
            profile_dir: Optional[str] = None) -> FlowResult:
        """Coarse-to-fine optimization; optionally checkpoints each level to
        ``checkpoint_dir`` and resumes from the latest checkpoint there.

        ``debug_dir`` writes the per-level advected signals as colored PLYs
        ``resampled.{S,T}.<level>.ply`` — the reference's --debug dumps
        (OpticalFlow.cpp:458-465). ``profile_dir`` captures a jax.profiler
        trace of the level loop (open with TensorBoard / xprof)."""
        import contextlib
        import glob
        import os
        import sys

        profile_cm = jax.profiler.trace(profile_dir) if profile_dir \
            else contextlib.nullcontext()
        with profile_cm:
            return self._run_levels(verbose, checkpoint_dir, resume, debug_dir)

    def _run_levels(self, verbose, checkpoint_dir, resume, debug_dir) -> FlowResult:
        import glob
        import os
        import sys

        cfg = self.config
        self._ensure_signals()
        coeffs, tfield = self.coeffs, self.tfield
        s_weight = cfg.scalar_smooth_weight
        v_weight = cfg.resolved_vf_smooth_weight()
        start_level = 0
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            if resume:
                ckpts = sorted(glob.glob(os.path.join(checkpoint_dir, "level_*.npz")))
                if ckpts:
                    lvl, s_weight, v_weight = self.load_checkpoint(ckpts[-1])
                    coeffs, tfield = self.coeffs, self.tfield
                    start_level = lvl + 1
        metrics: List[Dict] = []
        # Warm start across levels: the flow DoF space is level-invariant
        # (the basis lives on the fixed mesh), so the previous level's solved
        # direction seeds the next level's refinement. Restored from the
        # checkpoint on resume so resumed runs stay deterministic.
        warm_x = getattr(self, "_warm_x", None) if cfg.flow_warm_start else None
        self._warm_x = None
        nd = self._ensure_nd()
        for level in range(start_level, cfg.levels):
            t0 = time.time()
            coeffs, tfield, stats, resampled = _level_step(
                self.arrays, coeffs, tfield, jnp.asarray(s_weight, self.dtype),
                jnp.asarray(v_weight, self.dtype), cfg, self.coarse,
                getattr(self, "vcoarse", None), getattr(self, "patch", None),
                getattr(self, "vpatch", None), want_resampled=debug_dir is not None,
                compact_trace=self.device_mesh is None, warm_x=warm_x,
                device_mesh=self.device_mesh, level=level, nd=nd)
            if cfg.flow_warm_start:
                from meshopticalflow_tpu.models.base import LAST_FLOW_SOLVE
                warm_x = LAST_FLOW_SOLVE.get("x")
            if level == start_level and getattr(self, "_exp_exhausted", None) is not None:
                stats["exp_remap_exhausted"] = self._exp_exhausted
                self._exp_exhausted = None
            stats = {k: (v if isinstance(v, str) else float(np.asarray(v)))
                     for k, v in stats.items()}
            stats.update(level=level, s_weight=s_weight, v_weight=v_weight,
                         seconds=time.time() - t0)
            _exp_cap = stats.get("exp_remap_exhausted", 0)
            if _exp_cap:
                print(f"[WARNING] exp remap: {int(_exp_cap)} texel lanes hit "
                      f"the step cap", file=sys.stderr)
            if stats["trace_exhausted"] > 0:
                # The reference warns per-lane on cap exhaustion (FEM.inl:897).
                print(f"[WARNING] level {level}: "
                      f"{int(stats['trace_exhausted'])} trace lanes hit the "
                      f"{cfg.flow_max_steps}-step cap mid-path", file=sys.stderr)
            if debug_dir is not None:
                self._write_debug_dumps(debug_dir, level, np.asarray(resampled))
            metrics.append(stats)
            if verbose:
                print(json.dumps({k: (float(f"{v:.6g}") if isinstance(v, float) else v)
                                  for k, v in stats.items()}))
            s_weight *= cfg.scalar_weight_multiplier
            if v_weight * cfg.vf_weight_multiplier > cfg.vf_smooth_weight_threshold:
                v_weight = v_weight * cfg.vf_weight_multiplier
            if checkpoint_dir:
                self.coeffs, self.tfield = coeffs, tfield
                self.save_checkpoint(
                    os.path.join(checkpoint_dir, f"level_{level:03d}.npz"),
                    level, s_weight, v_weight, warm_x=warm_x)
        self.coeffs, self.tfield = coeffs, tfield
        return FlowResult(np.asarray(coeffs), np.asarray(tfield), metrics)

    def _write_debug_dumps(self, debug_dir: str, level: int,
                           resampled: np.ndarray) -> None:
        """Per-level resampled.{S,T}.<level>.ply dumps (--debug,
        OpticalFlow.cpp:458-465). 6-channel signals blend as c[j] + c[j+3]
        (OutputMesh, OpticalFlow.cpp:150-162); binary-LE like the reference's
        PLY_BINARY_NATIVE on x86."""
        import os

        os.makedirs(debug_dir, exist_ok=True)
        c = resampled.shape[1] // 2
        verts = self.vertices if self.vertices is not None else \
            np.zeros((resampled.shape[0], 3))
        for s, tag in ((0, "S"), (1, "T")):
            sig = resampled[:, s * c:(s + 1) * c]
            colors = sig if c == 3 else sig[:, :3] + sig[:, 3:6]
            write_ply_colored(os.path.join(debug_dir, f"resampled.{tag}.{level}.ply"),
                              verts, colors, self.mesh.triangles, fmt="binary_le")

    # -- final outputs ---------------------------------------------------

    def advected_vertex_colors(self, alpha: float = 0.5) -> np.ndarray:
        """Advect the original input colors to the halfway point
        (InputGeometryData::flow, OpticalFlow.cpp:476-490). Returns (2, V, 3)."""
        cfg = self.config
        outs = []
        for s in range(2):
            length = -alpha if s == 0 else 1.0 - alpha
            outs.append(_advect_colors_jit(
                self.arrays.tm, self.tfield, self.vertex_colors[s],
                jnp.asarray(length, self.dtype), cfg.flow_min_step, cfg.flow_max_steps))
        return np.stack([np.asarray(o) for o in outs])

    def advected_textures(self, alpha: float = 0.5) -> np.ndarray:
        """Advect both textures to the halfway point
        (InputTextureData::flow, OpticalFlow.cpp:501-515). Returns (2, H, W, 3)
        in uv-space row order; unclaimed texels keep the input.

        Texel marching runs with between-phase lane compaction
        (kernels/advect.py): path lengths are heavy-tailed, so the march
        re-batches the surviving lanes every few dozen steps."""
        import sys as _sys

        from meshopticalflow_tpu.kernels.advect import advect_texture_compacted

        cfg = self.config
        src = self.texture_source
        h, w = src.height, src.width
        _t0 = time.time()
        outs = [self._advect_one_texture(s, alpha).reshape(h, w, 3)
                for s in range(2)]
        result = np.stack([np.asarray(o) for o in outs])
        secs = time.time() - _t0
        # Observability: the project's headline metric, measured in-pipeline.
        self.last_advect_stats = {
            "seconds": round(secs, 2),
            "texels_per_sec": round(2 * h * w / max(secs, 1e-9), 1)}
        return result

    def _ensure_advect_order(self) -> None:
        """March lanes sorted by starting triangle: the per-step fused-row
        gathers hit coherent table rows (~13% measured on the 2K advect).
        The permutation is static per problem; outputs scatter back to
        raster order.

        Sorted ON DEVICE: the old host argsort started with a d2h fetch of
        the whole texel table (134 MB at 4K ≈ 11 s over the ~12 MB/s
        tunnel, measured in bench_runs/round4_profile_advect_2026-08-19)
        and re-uploaded the reordered copies.  Per-lane march results are
        permutation-independent (the scatter undoes the order), so the
        device sort needs no parity with numpy's."""
        if getattr(self, "_advect_order", None) is None:
            order, t_s, p_s = _advect_order_jit(self.src_t, self.src_p)
            self._advect_order = order
            self._advect_src_t = t_s
            self._advect_src_p = p_s

    def _ensure_quad_tables(self):
        """Per-texture bilinear quad tables (kernels/advect.build_quad_table),
        built on device once per problem."""
        if getattr(self, "_quad_tables", None) is None:
            from meshopticalflow_tpu.kernels.advect import build_quad_table
            self._quad_tables = tuple(
                jax.jit(build_quad_table)(self.textures[s]) for s in range(2))
        return self._quad_tables

    def _advect_one_texture(self, s: int, alpha: float):
        """Advect texture ``s`` to the halfway point; returns the flat
        (H*W, 3) float colors ON DEVICE (raster order, unclaimed texels
        keep the input)."""
        import sys as _sys

        from meshopticalflow_tpu.kernels.advect import advect_texture_compacted

        cfg = self.config
        self._ensure_advect_order()
        length = -alpha if s == 0 else 1.0 - alpha
        quad = self._ensure_quad_tables()[s] if not cfg.nearest else None
        colors_s, _, _, exhausted = advect_texture_compacted(
            self.arrays.tm, self.tfield, self.tri_uvs, self.textures[s],
            self._advect_src_t, self._advect_src_p,
            jnp.asarray(length, self.dtype),
            cfg.flow_min_step, cfg.flow_max_steps, not cfg.nearest,
            quad=quad)
        if exhausted:
            print(f"[WARNING] texture advection: {exhausted} texel lanes "
                  f"hit the {cfg.flow_max_steps}-step cap", file=_sys.stderr)
        colors = jnp.zeros_like(colors_s).at[self._advect_order].set(colors_s)
        base = jnp.flipud(self.textures[s]).reshape(-1, 3)
        return jnp.where((self.src_t >= 0)[:, None], colors, base)

    def halfway_texture(self, alpha: float = 0.5) -> np.ndarray:
        """(H, W, 3) uint8 halfway blend (the --out result), blended and
        quantized ON DEVICE.

        The march itself is ~0.4 s warm at 2K; the old path's two 50 MB
        float32 device-to-host fetches dominated the advect stage over the
        tunneled runtime. Blending + clip/uint8-cast on device (same float
        ops and the same truncating cast as the host write path, so the
        output is bit-identical) downloads 12.5 MB once — ~8x fewer d2h
        bytes. Matches OutputImage semantics (OpticalFlow.cpp:1044-1047).

        Both textures' lanes march in ONE compacted trace (per-lane flow
        times -alpha / 1-alpha): the compaction batches stay fuller and the
        host-orchestration overhead is paid once instead of twice. The
        per-lane float ops are unchanged, so the blend stays bit-identical
        to the two-pass path."""
        import sys as _sys

        from meshopticalflow_tpu.kernels.advect import (_fetch_colors,
                                                        flow_field_trace_compacted)

        cfg = self.config
        src = self.texture_source
        h, w = src.height, src.width
        _t0 = time.time()
        self._ensure_advect_order()
        n = self._advect_src_t.shape[0]
        t2, p2, times = _halfway_lanes(self._advect_src_t, self._advect_src_p,
                                       jnp.asarray(-alpha, self.dtype),
                                       jnp.asarray(1.0 - alpha, self.dtype))
        t1, p1, exhausted = flow_field_trace_compacted(
            self.arrays.tm, self.tfield, times, t2, p2,
            cfg.flow_min_step, cfg.flow_max_steps)
        if exhausted:
            print(f"[WARNING] texture advection: {exhausted} texel lanes "
                  f"hit the {cfg.flow_max_steps}-step cap", file=_sys.stderr)
        # The two texture samplings stay in _fetch_colors' own jit (its
        # compiled float ops are the bit-identity contract with the
        # two-pass path); the scatter/where/blend/quantize tail fuses into
        # one dispatch instead of ~8 eager ones.  Bilinear goes through the
        # one-row-per-lane quad table (build_quad_table: gathers cost per
        # ROW here; bit-identical blend).
        quads = self._ensure_quad_tables() if not cfg.nearest else (None, None)
        c0 = _fetch_colors(self.arrays.tm, self.tri_uvs, self.textures[0],
                           t1[:n], p1[:n], not cfg.nearest, quad=quads[0])
        c1 = _fetch_colors(self.arrays.tm, self.tri_uvs, self.textures[1],
                           t1[n:], p1[n:], not cfg.nearest, quad=quads[1])
        q = _halfway_tail(c0, c1, self._advect_order, self.src_t,
                          self.textures[0], self.textures[1], h, w)
        # One u8 download; band-parallel when MESHFLOW_FETCH_PARTS > 1
        # (set per deployment from the scripts/exp_fetch.py probe).
        from meshopticalflow_tpu.utils.fetch import fetch as _fetch
        result = _fetch(q)
        secs = time.time() - _t0
        self.last_advect_stats = {
            "seconds": round(secs, 2),
            "texels_per_sec": round(2 * h * w / max(secs, 1e-9), 1)}
        return result

    def advected_texture_frames(self, frames: int) -> np.ndarray:
        """N-frame texture interpolation (InputTextureData::flow frames
        overload, OpticalFlow.cpp:517-539): flow the texel table repeatedly
        by +-1/(frames-1), sampling the original textures each frame.
        Returns (2, frames, H, W, 3) in uv-space row order."""
        from meshopticalflow_tpu.kernels.advect import advect_texture_frames_scan

        cfg = self.config
        src = self.texture_source
        h, w = src.height, src.width
        alpha = 1.0 / (frames - 1)
        outs = np.empty((2, frames, h, w, 3), np.float64)
        for s in range(2):
            base_img = np.flipud(np.asarray(self.textures[s], np.float64))
            outs[s, 0] = base_img
            length = -alpha if s == 0 else alpha
            # ONE jitted lax.scan over the frames (SURVEY section 5; the
            # reference host-loops, OpticalFlow.cpp:517-539).
            colors = advect_texture_frames_scan(
                self.arrays.tm, self.tfield, self.tri_uvs, self.textures[s],
                self.src_t, self.src_p, jnp.asarray(length, self.dtype),
                frames, cfg.flow_min_step, cfg.flow_max_steps,
                not cfg.nearest,
                quad=self._ensure_quad_tables()[s] if not cfg.nearest
                else None)
            base_flat = jnp.flipud(self.textures[s]).reshape(-1, 3)
            colors = jnp.where((self.src_t >= 0)[None, :, None], colors,
                               base_flat[None])
            outs[s, 1:] = np.asarray(colors).reshape(frames - 1, h, w, 3)
        return outs

    def save_checkpoint(self, path: str, level: int, s_weight: float,
                        v_weight: float, warm_x=None) -> None:
        """Mid-run checkpoint of the optimization state (the reference has
        no resume; SURVEY.md section 5 asks for one). ``warm_x`` carries the
        level's solved flow direction so a resumed run warm-starts the next
        level exactly like the uninterrupted run would."""
        extra = {} if warm_x is None else {"warm_x": np.asarray(warm_x)}
        np.savez(path, coeffs=np.asarray(self.coeffs), tfield=np.asarray(self.tfield),
                 level=level, s_weight=s_weight, v_weight=v_weight, **extra)

    def load_checkpoint(self, path: str):
        data = np.load(path)
        self.coeffs = jnp.asarray(data["coeffs"], self.dtype)
        self.tfield = jnp.asarray(data["tfield"], self.dtype)
        self._warm_x = (jnp.asarray(data["warm_x"], self.dtype)
                        if "warm_x" in data else None)
        return int(data["level"]), float(data["s_weight"]), float(data["v_weight"])

    def write_output(self, path: str, alpha: float = 0.5) -> None:
        """Blend the two advected inputs and write (OpticalFlow.cpp:1044-1055)."""
        if self.texture_source is not None:
            blend = self.halfway_texture(alpha)    # device blend, one fetch
            write_png_rgb(path, np.flipud(blend))  # flipY (OpticalFlow.cpp:1047)
        else:
            adv = self.advected_vertex_colors(alpha)
            blend = (adv[0] + adv[1]) / 2.0
            write_ply_colored(path, self.vertices, blend, self.mesh.triangles, fmt="ascii")
