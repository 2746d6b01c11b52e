"""Mixed-precision iterative refinement for the level flow solves.

The reference factorizes in double precision (EigenCholeskySolverLDLt,
LinearSolvers.h:340-391). On TPU the device solve runs in float32; for the
nearly-singular Gauss-Newton systems (data term ~ rank-deficient along
isophotes + tiny lambda*S) a 1e-7 relative residual still leaves O(1)
solution error along near-null directions — observed as large spurious
smooth flows. Classical iterative refinement fixes this at f32 speed:

    x = 0  (float64, host)
    repeat: r = b - A x (float64 CSR on host) ; e = CG_f32(A, r) ; x += e

Each round multiplies the residual by the f32 solver's reduction factor, so
a few rounds reach ~1e-13 relative residual — the f64-direct-solve quality
the reference gets, without f64 device math (emulated and slow on TPU).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from meshopticalflow_tpu.solvers.cg import CGStats, ell_pcg

# Host CSR pattern cache keyed by the ELL cols array identity (weakref-guarded
# against id reuse after garbage collection).
import weakref

_PATTERN_CACHE: Dict[int, Tuple[object, np.ndarray, np.ndarray]] = {}


def _host_csr(cols: jnp.ndarray, vals: jnp.ndarray) -> sp.csr_matrix:
    key = id(cols)
    entry = _PATTERN_CACHE.get(key)
    if entry is None or entry[0]() is not cols:
        cols_h = np.asarray(cols)
        n, w = cols_h.shape
        rows_h = np.repeat(np.arange(n, dtype=np.int64), w)
        _PATTERN_CACHE[key] = (weakref.ref(cols), rows_h, cols_h.astype(np.int64).ravel())
        if len(_PATTERN_CACHE) > 8:
            _PATTERN_CACHE.pop(next(iter(_PATTERN_CACHE)))
        entry = _PATTERN_CACHE[key]
    _, rows_h, cols_flat = entry
    n = cols.shape[0]
    return sp.csr_matrix((np.asarray(vals, np.float64).ravel(), (rows_h, cols_flat)),
                         shape=(n, n))


def _df32_available() -> bool:
    from meshopticalflow_tpu.solvers.df32 import df32_probe
    import jax
    return df32_probe(jax.default_backend())


def refine_loop(cols, vals, b, inner_solve, tol: float = 1e-12,
                max_rounds: int = 5, inner_floor: float = 1e-6,
                residuals: str = "auto", x0=None):
    """Iterative refinement around an arbitrary inner solver.

    ``inner_solve(r_device, inner_tol, r_norm2) -> (e_device, CGStats)``
    approximately solves A e = r to relative tolerance ``inner_tol``;
    ``r_norm2`` is the (host-known) squared norm of the passed r so the
    inner solver can skip its own device norm fetch. Outer residuals are
    evaluated to ~f64 accuracy ON DEVICE via double-float arithmetic
    (solvers/df32.py) — only two convergence scalars cross the tunnel per
    round. ``residuals="host"`` keeps the round-2 f64 scipy CSR path
    (the fallback when df32_probe fails on a miscompiling backend). The
    per-round inner tolerance adapts: round k only needs to close the
    REMAINING gap (tol / rel), so late rounds run a fraction of the first
    round's iterations.

    ``x0`` warm-starts the refinement (e.g. the previous level's solved
    direction): round 1 then only closes the gap b - A x0, and the adaptive
    inner tolerance turns any head start directly into fewer iterations.
    A useless x0 is harmless — the first round's residual is just ~||b||
    and the best-iterate tracking keeps whatever is better.
    """
    if residuals == "auto":
        # df32 targets the f32 production path; f64 problems (CPU oracle
        # runs) keep the host f64 CSR residuals with identical rounding.
        residuals = "device" if (jnp.dtype(b.dtype) == jnp.float32
                                 and _df32_available()) else "host"
    if residuals == "device":
        return _refine_loop_device(cols, vals, b, inner_solve, tol,
                                   max_rounds, inner_floor, x0=x0)
    a_host = _host_csr(cols, vals)
    b_host = np.asarray(b, np.float64)
    b_norm = float(np.linalg.norm(b_host))
    if b_norm == 0:
        return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                          jnp.asarray(0.0, b.dtype))
    x = np.zeros_like(b_host)
    if x0 is not None:
        x_cand = np.asarray(x0, np.float64)
        if (x_cand.shape == b_host.shape
                and np.linalg.norm(b_host - a_host @ x_cand) < b_norm):
            x = x_cand
    total_iters = 0
    best_x, best_rel = x, np.inf
    prev_rel = np.inf
    for _ in range(max_rounds):
        r = b_host - a_host @ x
        rel = float(np.linalg.norm(r)) / b_norm
        if rel < best_rel:
            best_x, best_rel = x, rel
        if rel < max(tol, 1e-11) or rel > 0.5 * prev_rel:
            break
        prev_rel = rel
        scale = float(np.max(np.abs(r))) or 1.0
        inner_tol = min(max(tol / rel, inner_floor), 0.5)
        # r_norm2=None: the f64 oracle path keeps the inner solver's own
        # norm computation so its iteration counts stay bit-stable (golden
        # parity); the device path is where the fetch economy matters.
        e, stats = inner_solve(jnp.asarray(r / scale, b.dtype), inner_tol,
                               None)
        total_iters += int(stats.iterations)
        x = x + np.asarray(e, np.float64) * scale
    else:
        r = b_host - a_host @ x
        rel = float(np.linalg.norm(r)) / b_norm
        if rel < best_rel:
            best_x, best_rel = x, rel
    return jnp.asarray(best_x, b.dtype), CGStats(jnp.asarray(total_iters, jnp.int32),
                                                 jnp.asarray(min(best_rel, 1e30), b.dtype))


import jax as _jax


@_jax.jit
def _vec_stats(v):
    """[||v||^2, max|v|] in one dispatch (the refinement entry fetch)."""
    return jnp.stack([jnp.vdot(v, v), jnp.max(jnp.abs(v))])


@_jax.jit
def _scale_vec(v, scale):
    return v / scale


@_jax.jit
def _final_check_stats(stats_f, b):
    """[||r_final||^2, ||b||^2] — the fixed-schedule path's ONLY fetch."""
    return jnp.stack([stats_f[0], jnp.vdot(b, b)])


def refine_fixed_pipelined(cols, vals, b, inner_fixed, schedule, tol: float,
                           inner_solve=None, max_rounds: int = 5,
                           inner_floor: float = 1e-6):
    """Two-fetch refinement: run a KNOWN round schedule as one async
    dispatch chain (round-4 dispatch economy).

    ``inner_fixed(r_device, iters) -> e_device`` runs exactly ``iters``
    PCG iterations with NO host fetch (PallasMG3Solver.solve_fixed).
    ``schedule`` is the per-round iteration counts measured on an earlier
    level of the same problem (the systems differ only in the data term,
    so the counts transfer). The host enqueues

        scale b -> PCG(n1) -> df32 residual(+scale, on device)
                -> PCG(n2) -> ... -> final df32 residual stats

    and fetches ONCE at the end. The df32 product materialization keeps
    its own dispatch boundary (solvers/df32.py FMA-contraction contract) —
    boundaries are free, host ROUND TRIPS are what this path removes
    (~5 of the adaptive loop's ~7 per level, ~0.1-0.3 s each on the
    tunneled runtime).

    If the final residual misses ``tol``, falls back to the adaptive
    ``_refine_loop_device`` seeded with the df32 iterate (needs
    ``inner_solve`` as in refine_loop). Returns (x, stats, hit) where
    ``hit`` says the schedule reached tol (callers un-pin the schedule
    when it did not)."""
    import jax as _jax2

    from meshopticalflow_tpu.solvers.df32 import (df32_mode, df_update,
                                                  ell_residual_df,
                                                  ell_residual_df_scaled)

    vals_f32 = vals.astype(jnp.float32)
    b_f32 = b.astype(jnp.float32)
    fused = (hasattr(inner_fixed, "__self__")
             and hasattr(inner_fixed.__self__, "fixed_first_round"))
    if fused:
        # Fully fused rounds (PallasMG3Solver): 1 program for round 1
        # (which computes the max|b| scale in-program — no entry fetch),
        # 2 per later round (products + residual/PCG/update) — host-side
        # dispatch latency is ~50 ms each on the tunneled runtime, so the
        # program count is itself a measurable slice of a 2 s solve.
        solver = inner_fixed.__self__
        mode = df32_mode(_jax2.default_backend())
        x_hi, x_lo = solver.fixed_first_round(b_f32, -1.0, int(schedule[0]))
        total = int(schedule[0])
        for n_k in schedule[1:]:
            x_hi, x_lo = solver.fixed_next_round(cols, vals_f32, x_hi, x_lo,
                                                 b_f32, int(n_k), mode)
            total += int(n_k)
    else:
        # Generic path for inner solvers without the fused rounds.
        stats0 = np.asarray(_vec_stats(b_f32))
        b_norm2_e, b_max = float(stats0[0]), float(stats0[1])
        if b_norm2_e == 0:
            return (jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                               jnp.asarray(0.0, b.dtype)),
                    True)
        e = inner_fixed(_scale_vec(b_f32, jnp.float32(b_max or 1.0)),
                        int(schedule[0]))
        x_hi, x_lo = df_update(jnp.zeros_like(b_f32), jnp.zeros_like(b_f32),
                               e, jnp.float32(b_max or 1.0))
        total = int(schedule[0])
        for n_k in schedule[1:]:
            r_scaled, stats_mid = ell_residual_df_scaled(cols, vals_f32,
                                                         x_hi, x_lo, b_f32)
            e = inner_fixed(r_scaled, int(n_k))
            # the scale reaches df_update as a DEVICE scalar — no fetch
            x_hi, x_lo = df_update(x_hi, x_lo, e, stats_mid[1])
            total += int(n_k)
    _, _, stats_f = ell_residual_df(cols, vals_f32, x_hi, x_lo, b_f32)
    final = np.asarray(_final_check_stats(stats_f, b_f32))
    r2_f, b_norm2 = float(final[0]), float(final[1])
    if b_norm2 == 0:
        return (jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                           jnp.asarray(0.0, b.dtype)), True)
    b_norm = float(np.sqrt(b_norm2))
    rel = float(np.sqrt(max(r2_f, 0.0))) / b_norm
    _LAST_ROUNDS[0] = [(int(n), None) for n in schedule]
    if rel < max(tol, 1e-11):
        return (x_hi.astype(b.dtype),
                CGStats(jnp.asarray(total, jnp.int32),
                        jnp.asarray(rel, b.dtype)), True)
    # Schedule missed: mop up with the adaptive loop from this iterate.
    x, stats = _refine_loop_device(cols, vals, b, inner_solve, tol,
                                   max_rounds, inner_floor, x0=x_hi)
    return (x, CGStats(stats.iterations + total, stats.rel_residual),
            False)


def _refine_loop_device(cols, vals, b, inner_solve, tol: float,
                        max_rounds: int, inner_floor: float, x0=None):
    """Device-resident refinement: x lives as a df32 (hi, lo) pair, the
    residual SpMV runs compensated f32 on the ELL layout, and the host only
    fetches [||r||^2, max|r|] each round (VERDICT r2 next #5).

    Dispatch economy (each host round trip is ~0.1-0.3 s on the tunneled
    runtime): the residual, its norms, and the 1/max|r| scaling fuse into
    ONE device dispatch + one fetch per round (df32.ell_residual_df_scaled);
    the cold first round skips the residual entirely (it is exactly b, whose
    norms the entry fetch already produced); and the known ||r_scaled||^2 is
    handed to the inner solver so it does not re-fetch its own b-norm."""
    from meshopticalflow_tpu.solvers.df32 import (df_update,
                                                  ell_residual_df_scaled)

    vals_f32 = vals.astype(jnp.float32)
    b_f32 = b.astype(jnp.float32)
    stats0 = np.asarray(_vec_stats(b_f32))
    b_norm2, b_max = float(stats0[0]), float(stats0[1])
    if b_norm2 == 0:
        return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                          jnp.asarray(0.0, b.dtype))
    b_norm = float(np.sqrt(b_norm2))
    warm = x0 is not None and x0.shape == b.shape
    x_hi = x0.astype(jnp.float32) if warm else jnp.zeros_like(b_f32)
    x_lo = jnp.zeros_like(b_f32)
    total_iters = 0
    rounds = []   # (inner_iters, outer_rel_before) observability trail
    best_x, best_rel = x_hi, np.inf
    prev_rel = np.inf
    for round_idx in range(max_rounds + 1):
        if round_idx == 0 and not warm:
            # x == 0: the residual IS b (the compensated SpMV of zeros is
            # exact), so reuse the entry norms instead of dispatching one.
            scale = b_max or 1.0
            r_scaled = _scale_vec(b_f32, jnp.float32(scale))
            rel, r2 = 1.0, b_norm2
        else:
            r_scaled, stats = ell_residual_df_scaled(cols, vals_f32, x_hi,
                                                     x_lo, b_f32)
            stats_h = np.asarray(stats)
            r2, scale = float(stats_h[0]), float(stats_h[1]) or 1.0
            rel = float(np.sqrt(max(r2, 0.0))) / b_norm
            if warm and round_idx == 0 and rel >= 1.0:
                # The warm start did not reduce the residual — discard it
                # and fall back to the zero start, whose residual is exactly
                # b (mirrors the host path's accept guard; no extra SpMV).
                x_hi = jnp.zeros_like(b_f32)
                scale = b_max or 1.0
                r_scaled = _scale_vec(b_f32, jnp.float32(scale))
                rel, r2 = 1.0, b_norm2
        if rel < best_rel:
            best_x, best_rel = x_hi, rel
        # Stop at the target, near the df32 noise floor, at stagnation
        # (<2x improvement), or after max_rounds inner solves — matching the
        # host path's exit conditions (the +1th pass is residual-only).
        if rel < max(tol, 1e-11) or rel > 0.5 * prev_rel \
                or round_idx == max_rounds:
            break
        prev_rel = rel
        inner_tol = min(max(tol / rel, inner_floor), 0.5)
        e, st = inner_solve(r_scaled.astype(b.dtype), inner_tol,
                            r2 / (scale * scale))
        total_iters += int(st.iterations)
        rounds.append((int(st.iterations), rel))
        x_hi, x_lo = df_update(x_hi, x_lo, e.astype(jnp.float32),
                               jnp.float32(scale))
    _LAST_ROUNDS[0] = rounds
    return best_x.astype(b.dtype), CGStats(
        jnp.asarray(total_iters, jnp.int32),
        jnp.asarray(min(best_rel, 1e30), b.dtype))


# Most-recent device-refinement round trail (observability; read by the
# pipeline's level metrics right after the solve).
_LAST_ROUNDS = [[]]


def ell_solve_refined(
    cols: jnp.ndarray,
    vals: jnp.ndarray,        # (N, W) float32 system values
    diag: jnp.ndarray,
    b: jnp.ndarray,           # (N,)
    tol: float = 1e-12,
    max_rounds: int = 6,
    inner_tol: float = 1e-6,
    inner_iters: int = 2000,
    chunk: int = 128,
    residuals: str = "auto",
    x0=None,
) -> Tuple[jnp.ndarray, CGStats]:
    """Solve A x = b to ~float64 residual accuracy. Returns (x as b.dtype,
    stats with total inner iterations and the final f64-grade relative
    residual). Residuals run on device (df32) when the backend supports it;
    ``residuals="host"`` forces the f64 scipy path."""
    if residuals == "auto":
        # df32 targets the f32 production path; f64 problems (CPU oracle
        # runs) keep the host f64 CSR residuals with identical rounding.
        residuals = "device" if (jnp.dtype(b.dtype) == jnp.float32
                                 and _df32_available()) else "host"
    if residuals == "device":
        return _refine_loop_device(
            cols, vals, b,
            lambda r, t, rn2=None: ell_pcg(cols, vals, diag, r,
                                           tol=min(max(t, inner_tol), 0.5),
                                           max_iters=inner_iters, chunk=chunk,
                                           b_norm2=rn2),
            tol, max_rounds, inner_tol, x0=x0)
    a_host = _host_csr(cols, vals)
    b_host = np.asarray(b, np.float64)
    b_norm = float(np.linalg.norm(b_host))
    if b_norm == 0:
        return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                          jnp.asarray(0.0, b.dtype))
    x = np.zeros_like(b_host)
    if x0 is not None:
        x_cand = np.asarray(x0, np.float64)
        if (x_cand.shape == b_host.shape
                and np.linalg.norm(b_host - a_host @ x_cand) < b_norm):
            x = x_cand
    total_iters = 0
    best_x, best_rel = x, 1.0
    prev_rel = np.inf
    for _ in range(max_rounds):
        r = b_host - a_host @ x
        rel = float(np.linalg.norm(r)) / b_norm
        if rel < best_rel:
            best_x, best_rel = x, rel
        # Stop at the target, near the float64 noise floor, or at stagnation
        # (<2x improvement) — the next round's rhs would be numerical noise
        # outside range(A), and CG on that can diverge for semi-definite
        # systems.
        if rel < max(tol, 1e-11) or rel > 0.5 * prev_rel:
            break
        prev_rel = rel
        # Scale the residual toward O(1) so a low-precision inner solve keeps
        # significance even when the outer residual is ~1e-10.
        scale = float(np.max(np.abs(r))) or 1.0
        r_dev = jnp.asarray(r / scale, b.dtype)
        e, stats = ell_pcg(cols, vals, diag, r_dev, tol=inner_tol,
                           max_iters=inner_iters, chunk=chunk)
        total_iters += int(stats.iterations)
        x = x + np.asarray(e, np.float64) * scale
    else:
        r = b_host - a_host @ x
        rel = float(np.linalg.norm(r)) / b_norm
        if rel < best_rel:
            best_x, best_rel = x, rel
    return jnp.asarray(best_x, b.dtype), CGStats(jnp.asarray(total_iters, jnp.int32),
                                                 jnp.asarray(best_rel, b.dtype))