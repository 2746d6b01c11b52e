"""Blocked banded Cholesky factorization and solves on the MXU.

The TPU replacement for the reference's sparse direct solver
(EigenCholeskySolverLLt/LDLt, include/Misha/LinearSolvers.h:249-391): the
reference amortizes a symbolic factorization and numerically refactorizes
per level; this module amortizes an RCM BAND layout and refactorizes per
level as a lax.scan of dense MXU blocks.

Why banded instead of general supernodal: after reverse-Cuthill-McKee the
mesh operators here are narrow-banded (the flow system's semiband is a few
hundred at n=3e5), so a dense sliding window of (bw+nb)^2 floats captures
the whole Schur complement — every flop is a dense (bw x nb) panel matmul
or an (nb x nb) Cholesky, exactly what the MXU wants, with NO indexed
scatter/gather inside the factorization loop.

Algorithm (right-looking banded Cholesky, block size nb, padded semiband bw):

    carry W (bw+nb, bw+nb): accumulated Schur corrections for the active
    window A[i*nb : i*nb+nb+bw)^2.
    step i:
      D  = sym(S_i[:nb])   + W[:nb, :nb]          (nb x nb)
      Ld = chol(D + shift*I)
      P  = S_i[nb:]        + W[nb:, :nb]          (bw x nb)
      Lp = P Ld^{-T}                               (triangular solve)
      W' = shift_up_left(W, nb) - [Lp Lp^T]        (bw x bw Schur update)
      emit [Ld; Lp]                                ((nb+bw) x nb)

Values are scatter-gathered once per refactorization from the problem's
padded-ELL layout through a precomputed static slot map (the same revalue
trick the Pallas MG packs use), so a per-level refactorization is ONE
device scatter + ONE scan — no host work.

Precision: float32 with a relative diagonal shift; consumers wrap the solve
in PCG or iterative refinement (solvers/refine.py) to reach f64-grade
residuals, mirroring how the reference's f64 factorization is replaced.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax


# ----------------------------------------------------------------------------
# Host-side layout (static per sparsity pattern)
# ----------------------------------------------------------------------------

@dataclasses.dataclass
class BandPattern:
    """Static banded layout for one sparsity pattern."""

    perm: np.ndarray        # (n,) RCM permutation (new -> old)
    inv_perm: np.ndarray    # (n,) old -> new
    n: int
    nb: int                 # block size
    bw: int                 # padded semiband (multiple of nb)
    m: int                  # number of block steps = ceil(n / nb)
    slots: np.ndarray       # (nnz_ell,) int64 flat slot into (m, nb+bw, nb),
    #                         or the dump slot for upper-triangle duplicates


def build_band_pattern(ell_cols: np.ndarray, nb: int = 128,
                       bw_pad: Optional[int] = None) -> BandPattern:
    """RCM-order the pattern and precompute the ELL-entry -> band-slot map.

    Every ELL entry (r, c) with inv_perm[c] <= inv_perm[r] lands in the
    lower band storage of step i = inv_perm[c] // nb at (inv_perm[r] - i*nb,
    inv_perm[c] - i*nb); strict-upper entries map to a dump slot (the
    factorization symmetrizes the diagonal block from the lower triangle).
    """
    cols = np.asarray(ell_cols)
    n, w = cols.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), w)
    pattern = sp.csr_matrix((np.ones(n * w, np.float32),
                             (rows, cols.astype(np.int64).ravel())),
                            shape=(n, n))
    perm = np.asarray(sp.csgraph.reverse_cuthill_mckee(pattern,
                                                       symmetric_mode=True),
                      np.int64)
    inv_perm = np.empty(n, np.int64)
    inv_perm[perm] = np.arange(n)
    pr = inv_perm[rows]
    pc = inv_perm[cols.astype(np.int64).ravel()]
    semiband = int(np.max(np.abs(pr - pc))) if n else 0
    bw = max(int(-(-semiband // nb)) * nb, nb)
    if bw_pad is not None:
        bw = max(bw, bw_pad)
    m = -(-n // nb)
    step = pc // nb
    lower = pr >= pc
    r_off = pr - step * nb
    c_off = pc - step * nb
    slot = step * (nb + bw) * nb + r_off * nb + c_off
    dump = m * (nb + bw) * nb  # one scratch slot past the end
    slots = np.where(lower, slot, dump)
    return BandPattern(perm=perm, inv_perm=inv_perm, n=n, nb=nb, bw=bw, m=m,
                       slots=slots.astype(np.int64))


# ----------------------------------------------------------------------------
# Device kernels
# ----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("m", "nb", "bw", "n"))
def band_revalue(slots, ell_vals, m: int, nb: int, bw: int, n: int = -1):
    """Scatter padded-ELL values into the (m, nb+bw, nb) band blocks.

    Rows beyond ``n`` (block padding when n % nb != 0) get a UNIT diagonal:
    they are decoupled identity equations, so the zero-shift Cholesky
    succeeds instead of breaking down on a zero pivot and escalating."""
    flat = jnp.zeros(m * (nb + bw) * nb + 1, jnp.float32)
    flat = flat.at[slots].add(ell_vals.astype(jnp.float32).ravel())
    blocks = flat[:-1].reshape(m, nb + bw, nb)
    if n >= 0 and m * nb > n:
        rows = (jnp.arange(m)[:, None] * nb + jnp.arange(nb)[None, :]) >= n
        eye = jnp.eye(nb, dtype=jnp.float32)
        blocks = blocks.at[:, :nb, :].add(rows[:, None, :] * eye[None])
    return blocks


@functools.partial(jax.jit, static_argnames=("nb", "bw"))
def band_cholesky(s_blocks, shift, nb: int, bw: int):
    """Blocked banded Cholesky; returns (l_blocks (m, nb+bw, nb), ok flag).

    ``shift`` is ADDED to the diagonal (absolute, caller scales it); a
    breakdown (non-PD window) surfaces as ok=False, caller retries with a
    larger shift.
    """
    eye = jnp.eye(nb, dtype=jnp.float32)

    def step(w, s_i):
        d_low = jnp.tril(s_i[:nb])
        d = d_low + d_low.T - jnp.diag(jnp.diag(d_low)) + w[:nb, :nb] \
            + shift * eye
        ld = jnp.linalg.cholesky(d)
        p = s_i[nb:] + w[nb:, :nb]
        lp = lax.linalg.triangular_solve(ld, p, left_side=False, lower=True,
                                         transpose_a=True)
        # NaN containment: a breakdown poisons ld/lp; zero them so the scan
        # finishes with finite numbers and report via the flag instead.
        bad = ~jnp.all(jnp.isfinite(ld))
        ld = jnp.where(bad, eye, ld)
        lp = jnp.where(bad, 0.0, lp)
        schur = lp @ lp.T
        w_next = jnp.zeros_like(w)
        w_next = w_next.at[:bw, :bw].set(w[nb:, nb:][:bw, :bw] - schur)
        return w_next, (jnp.concatenate([ld, lp], axis=0), bad)

    w0 = jnp.zeros((nb + bw, nb + bw), jnp.float32)
    _, (l_blocks, bads) = lax.scan(step, w0, s_blocks)
    return l_blocks, ~jnp.any(bads)


# ----------------------------------------------------------------------------
# Panelized solves: fewer, fatter scan steps
#
# The factorization runs at nb=128 (small dense windows keep the Schur
# update cheap), but the SOLVES are pure latency: ~2*(n/nb) sequential scan
# steps of tiny triangular solves (938 steps ~ 22 ms at n=60k on the
# tunneled runtime) applied once per PCG iteration. Reblocking the factor
# into panels of S = k*nb columns with PREINVERTED S x S diagonal blocks
# turns each step into two dense matmuls and cuts the step count k-fold;
# the panel layout is built once per factorization from the band blocks
# (every L nonzero lives within bw rows of its column, so the panel window
# (S+bw, S) captures the whole panel).
# ----------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k",))
def build_solve_panels(l_blocks, k: int):
    """Reblock an (m, nb+bw, nb) Cholesky factor into solve panels.

    Returns (dinv (mp, S, S), pbelow (mp, bw, S)) with S = k*nb and
    mp = ceil(m/k): dinv is the INVERSE of the lower-triangular S x S
    diagonal panel, pbelow the band below it. Requires S <= bw (the solve
    scans shift their bw-row accumulator window by S each step)."""
    m, nbbw, nb = l_blocks.shape
    bw = nbbw - nb
    s = k * nb
    if s > bw:
        raise ValueError(f"panel width {s} exceeds band width {bw}")
    mp = -(-m // k)
    if mp * k > m:
        eye_blk = jnp.zeros((mp * k - m, nbbw, nb), l_blocks.dtype) \
            .at[:, :nb, :].set(jnp.eye(nb, dtype=l_blocks.dtype))
        l_blocks = jnp.concatenate([l_blocks, eye_blk], axis=0)
    lb = l_blocks.reshape(mp, k, nbbw, nb)
    panel = jnp.zeros((mp, s + bw, k, nb), l_blocks.dtype)
    for t in range(k):
        panel = panel.at[:, t * nb: t * nb + nbbw, t, :].set(lb[:, t])
    panel = panel.reshape(mp, s + bw, s)
    dpan = panel[:, :s, :]
    eye = jnp.eye(s, dtype=l_blocks.dtype)
    dinv = jax.vmap(lambda a: lax.linalg.triangular_solve(
        a, eye, left_side=True, lower=True))(dpan)
    return dinv, panel[:, s:, :]


def panel_lower_solve(dinv, pbelow, rhs_panels):
    """y from L y = rhs on the panel layout; rhs_panels (mp, S, c)."""
    s = dinv.shape[1]
    bw = pbelow.shape[1]
    c = rhs_panels.shape[-1]

    def step(acc, inp):
        di, pb, r = inp
        y = di @ (r - acc[:s])
        acc_next = jnp.concatenate([acc[s:], jnp.zeros((s, c), acc.dtype)],
                                   axis=0) + pb @ y
        return acc_next, y

    acc0 = jnp.zeros((bw, c), rhs_panels.dtype)
    _, y = lax.scan(step, acc0, (dinv, pbelow, rhs_panels))
    return y


def panel_upper_solve(dinv, pbelow, y_panels):
    """x from L^T x = y (reverse scan) on the panel layout."""
    s = dinv.shape[1]
    bw = pbelow.shape[1]
    c = y_panels.shape[-1]

    def step(xwin, inp):
        di, pb, y = inp
        t = y - pb.T @ xwin
        x = di.T @ t
        xwin_next = jnp.concatenate([x, xwin[: bw - s]], axis=0)
        return xwin_next, x

    xwin0 = jnp.zeros((bw, c), y_panels.dtype)
    _, x = lax.scan(step, xwin0, (dinv, pbelow, y_panels), reverse=True)
    return x


@functools.partial(jax.jit, static_argnames=("n",))
def band_solve_panels(dinv, pbelow, perm, inv_perm, b, n: int):
    """x = A^{-1} b through the panelized factorization."""
    squeeze = b.ndim == 1
    bc = b[:, None] if squeeze else b
    c = bc.shape[1]
    mp, s, _ = dinv.shape
    bp = bc.astype(jnp.float32)[perm]
    pad = mp * s - n
    bp = jnp.concatenate([bp, jnp.zeros((pad, c), bp.dtype)], axis=0) \
        if pad else bp
    y = panel_lower_solve(dinv, pbelow, bp.reshape(mp, s, c))
    x = panel_upper_solve(dinv, pbelow, y)
    xp = x.reshape(mp * s, c)[:n]
    out = xp[inv_perm].astype(b.dtype)
    return out[:, 0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("nb", "bw"))
def band_lower_solve(l_blocks, rhs_blocks, nb: int, bw: int):
    """y from L y = rhs; rhs_blocks (m, nb, c)."""
    c = rhs_blocks.shape[-1]

    def step(acc, inp):
        lb, r = inp
        ld, lp = lb[:nb], lb[nb:]
        y = lax.linalg.triangular_solve(ld, r - acc[:nb], left_side=True,
                                        lower=True)
        acc_next = jnp.concatenate([acc[nb:], jnp.zeros((nb, c), acc.dtype)],
                                   axis=0) + lp @ y
        return acc_next, y

    acc0 = jnp.zeros((bw, c), rhs_blocks.dtype)
    _, y = lax.scan(step, acc0, (l_blocks, rhs_blocks))
    return y


@functools.partial(jax.jit, static_argnames=("nb", "bw"))
def band_upper_solve(l_blocks, y_blocks, nb: int, bw: int):
    """x from L^T x = y (reverse scan); y_blocks (m, nb, c)."""
    c = y_blocks.shape[-1]

    def step(xwin, inp):
        lb, y = inp
        ld, lp = lb[:nb], lb[nb:]
        t = y - lp.T @ xwin
        x = lax.linalg.triangular_solve(ld, t, left_side=True, lower=True,
                                        transpose_a=True)
        xwin_next = jnp.concatenate([x, xwin[:-nb]], axis=0)
        return xwin_next, x

    xwin0 = jnp.zeros((bw, c), y_blocks.dtype)
    _, x = lax.scan(step, xwin0, (l_blocks, y_blocks), reverse=True)
    return x


@functools.partial(jax.jit, static_argnames=("nb", "bw", "n"))
def band_solve(l_blocks, perm, inv_perm, b, nb: int, bw: int, n: int):
    """x = A^{-1} b through the factorization (single rhs or (n, c))."""
    squeeze = b.ndim == 1
    bc = b[:, None] if squeeze else b
    c = bc.shape[1]
    m = l_blocks.shape[0]
    bp = bc.astype(jnp.float32)[perm]
    pad = m * nb - n
    bp = jnp.concatenate([bp, jnp.zeros((pad, c), bp.dtype)], axis=0) \
        if pad else bp
    rhs_blocks = bp.reshape(m, nb, c)
    y = band_lower_solve(l_blocks, rhs_blocks, nb, bw)
    x = band_upper_solve(l_blocks, y, nb, bw)
    xp = x.reshape(m * nb, c)[:n]
    out = xp[inv_perm].astype(b.dtype)
    return out[:, 0] if squeeze else out


class BandedCholeskySolver:
    """Banded direct solver with a static pattern and per-level revalue.

    Usage::

        pat = build_band_pattern(ell_cols)          # once per problem
        solver = BandedCholeskySolver(pat)
        solver.factor(ell_vals)                     # once per level
        x = solver.solve(b)                         # cheap, multi-rhs OK
    """

    def __init__(self, pattern: BandPattern, interpret: bool = False,
                 solve_panel_k: int = 8, keep_factor: bool = False):
        self.pat = pattern
        self.slots = jnp.asarray(pattern.slots)
        self.perm = jnp.asarray(pattern.perm, jnp.int32)
        self.inv_perm = jnp.asarray(pattern.inv_perm, jnp.int32)
        self.l_blocks = None
        self.shift_used = 0.0
        # Panelized solves (see build_solve_panels): S = k*nb <= bw. The
        # block factor is dropped after panelization unless ``keep_factor``
        # — solves only read the panels, and the factor pins ~nb+bw floats
        # per row (~276 MB at the production c1 shape).
        self.panel_k = max(1, min(solve_panel_k, pattern.bw // pattern.nb))
        self.keep_factor = keep_factor
        self.dinv = None
        self.pbelow = None

    def factor(self, ell_vals, diag: Optional[jnp.ndarray] = None,
               rel_shifts: Tuple[float, ...] = (0.0, 1e-6, 1e-4, 1e-2,
                                                1.0, 4.0, 16.0)):
        """Refactorize from ELL values; escalating relative diagonal shift.

        The shift scale is max |A| (fetched once per factorization) so the
        escalation reaches PD-ness even for indefinite inputs whose diagonal
        is tiny; SPD systems take the rel=0.0 first try."""
        pat = self.pat
        s_blocks = band_revalue(self.slots, ell_vals, pat.m, pat.nb,
                                pat.bw, pat.n)
        # max|A| is only needed once an attempt has failed; SPD inputs
        # succeed at the first (usually 0.0) shift without the fetch.
        dmax = None
        for rel in rel_shifts:
            if rel != 0.0 and dmax is None:
                dmax = float(jnp.max(jnp.abs(ell_vals)))
            l_blocks, ok = band_cholesky(s_blocks,
                                         jnp.float32(rel * (dmax or 0.0)),
                                         pat.nb, pat.bw)
            if bool(ok):
                self.shift_used = rel * (dmax or 0.0)
                self.dinv, self.pbelow = build_solve_panels(l_blocks,
                                                            self.panel_k)
                self.l_blocks = l_blocks if self.keep_factor else None
                return self
        raise RuntimeError("banded Cholesky breakdown at every shift")

    def solve(self, b):
        if self.dinv is None:
            raise RuntimeError("factor() before solve()")
        return band_solve_panels(self.dinv, self.pbelow, self.perm,
                                 self.inv_perm, b, self.pat.n)


# ----------------------------------------------------------------------------
# Banded-preconditioned PCG: the shift-invert inner solver
# ----------------------------------------------------------------------------

def _bpcg_step(cols, vals, dinv, pbelow, perm, inv_perm, n: int, s):
    """One banded-preconditioned PCG step; the SINGLE definition used by
    both the solver chunks and the contraction probe (so the probe always
    measures exactly the iteration it sizes)."""
    x, r, z, p, rz = s
    ap = jnp.sum(vals * p[cols], axis=1)
    pap = jnp.vdot(p, ap)
    alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
    x = x + alpha * p
    r = r - alpha * ap
    z = band_solve_panels(dinv, pbelow, perm, inv_perm, r, n).astype(r.dtype)
    rz_new = jnp.vdot(r, z)
    beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
    p = z + beta * p
    return (x, r, z, p, rz_new)


@functools.partial(jax.jit, static_argnames=("iters", "n"))
def _bpcg_chunk(cols, vals, dinv, pbelow, perm, inv_perm, x, r, z, p, rz,
                iters: int, n: int):
    def body(_, s):
        return _bpcg_step(cols, vals, dinv, pbelow, perm, inv_perm, n, s)

    x, r, z, p, rz = lax.fori_loop(0, iters, body, (x, r, z, p, rz))
    return x, r, z, p, rz, jnp.vdot(r, r)


@functools.partial(jax.jit, static_argnames=("iters", "n"))
def bpcg_probe(cols, vals, dinv, pbelow, perm, inv_perm, b, iters: int,
               n: int):
    """||r||^2 trajectory of ``iters`` banded-PCG steps on rhs ``b``.

    One dispatch + one (iters+1,)-float fetch, run once per factorization
    to MEASURE the preconditioner's contraction rate: the banded Cholesky
    is near-exact when the RCM band captures the whole pattern (2-3 digits
    per iteration) but degrades with band truncation or diagonal shifts,
    so fixed-trip inner solves are sized from this probe instead of a
    worst-case constant."""
    def body(s, _):
        s = _bpcg_step(cols, vals, dinv, pbelow, perm, inv_perm, n, s)
        return s, jnp.vdot(s[1], s[1])

    z0 = band_solve_panels(dinv, pbelow, perm, inv_perm, b, n).astype(b.dtype)
    state0 = (jnp.zeros_like(b), b, z0, z0, jnp.vdot(b, z0))
    _, hist = lax.scan(body, state0, None, length=iters)
    return jnp.concatenate([jnp.vdot(b, b)[None], hist])


def ell_pcg_banded(cols, vals, solver: "BandedCholeskySolver", b,
                   tol: float = 1e-10, max_iters: int = 400,
                   chunk: int = 16):
    """PCG on a padded-ELL system preconditioned by a banded Cholesky
    factorization of (a float32 approximation of) the same system.

    This is the TPU-native form of the reference's amortized shift-invert
    inner solve (EigenvalueSolver.h:176-217 factorizes S - sigma*B once with
    SimplicialLDLT and back-substitutes per Lanczos step): the factorization
    is built ONCE per operator, each application costs a handful of PCG
    iterations (kappa of the preconditioned system is ~1 + kappa(A)*eps_f32),
    and the iteration recovers whatever accuracy the f32 factorization lost.
    """
    import numpy as np

    pat = solver.pat
    b2 = float(jnp.vdot(b, b))
    if b2 == 0:
        from meshopticalflow_tpu.solvers.cg import CGStats
        return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                          jnp.asarray(0.0, b.dtype))
    x = jnp.zeros_like(b)
    r = b
    z = solver.solve(r).astype(b.dtype)
    p = z
    rz = jnp.vdot(r, z)
    threshold = (tol ** 2) * b2
    done = 0
    r2 = b2
    while done < max_iters and r2 > threshold:
        iters = min(chunk, max_iters - done)
        x, r, z, p, rz, r2_dev = _bpcg_chunk(
            cols, vals, solver.dinv, solver.pbelow, solver.perm,
            solver.inv_perm, x, r, z, p, rz, iters, pat.n)
        r2 = float(r2_dev)
        done += iters
    from meshopticalflow_tpu.solvers.cg import CGStats
    rel = float(np.sqrt(max(r2, 0.0) / b2))
    return x, CGStats(jnp.asarray(done, jnp.int32), jnp.asarray(rel, b.dtype))


@functools.partial(jax.jit, static_argnames=("iters", "n"))
def _bpcg_multi_chunk(cols, vals, dinv, pbelow, perm, inv_perm, x, r, z, p,
                      rz, iters: int, n: int):
    """``iters`` banded-preconditioned PCG steps on (n, c) block rhs —
    per-column step lengths, shared preconditioner application."""
    def matvec(v):
        return jnp.einsum("nk,nkc->nc", vals, v[cols])

    def coldot(u, v):
        return jnp.sum(u * v, axis=0)

    def body(_, s):
        x, r, z, p, rz = s
        ap = matvec(p)
        pap = coldot(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        z = band_solve_panels(dinv, pbelow, perm, inv_perm, r, n).astype(r.dtype)
        rz_new = coldot(r, z)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[None, :] * p
        return (x, r, z, p, rz_new)

    x, r, z, p, rz = lax.fori_loop(0, iters, body, (x, r, z, p, rz))
    return x, r, z, p, rz, jnp.sum(r * r, axis=0)


def ell_pcg_banded_multi(cols, vals, solver: "BandedCholeskySolver", b,
                         tol: float = 1e-10, max_iters: int = 400,
                         chunk: int = 16):
    """Multi-rhs ``ell_pcg_banded``: solve A X = B for B (n, c) with one
    banded-Cholesky-preconditioned PCG per column, stepped in bounded-size
    device dispatches (a single fused while_loop over a near-singular
    system can run past the tunneled TPU's dispatch watchdog and take the
    worker down — the spectrum purification solve hit exactly that).

    Columns converge jointly: the host loop stops when every column's
    residual passes ``tol`` (converged columns take harmless extra steps).
    """
    import numpy as np

    pat = solver.pat
    b2 = np.asarray(jnp.sum(b * b, axis=0), np.float64)
    if not b2.any():
        return jnp.zeros_like(b), 0
    x = jnp.zeros_like(b)
    r = b
    z = solver.solve(r).astype(b.dtype)
    p = z
    rz = jnp.sum(r * z, axis=0)
    threshold = (tol ** 2) * np.where(b2 > 0, b2, 1.0)
    done = 0
    r2 = b2
    while done < max_iters and (r2 > threshold).any():
        iters = min(chunk, max_iters - done)
        x, r, z, p, rz, r2_dev = _bpcg_multi_chunk(
            cols, vals, solver.dinv, solver.pbelow, solver.perm,
            solver.inv_perm, x, r, z, p, rz, iters, pat.n)
        r2 = np.asarray(r2_dev, np.float64)
        done += iters
    return x, done
