"""Three-level multigrid PCG on Pallas block-ELL kernels, fully on device.

The TPU-native replacement for the reference's per-level sparse Cholesky
(include/Misha/LinearSolvers.h:294-335). Same algorithm as solvers/mg3.py
(fine Whitney system -> Galerkin pre-subdivision coarse -> dense
patch-aggregated coarsest solved on the MXU), with the round-2 performance
design (VERDICT r1 items 1-2):

  * all SpMVs are Pallas block-ELL kernels (kernels/pallas_spmv.py) and the
    ENTIRE solver state lives in the operators' permuted tile layout — the
    x[perm]/y[inv_perm] gathers that cost ~5 ms each at N=325k are paid
    once per solve, not once per matvec;
  * preconditioner-side matvecs (Jacobi sweeps, residual restriction,
    transfers) stream bfloat16 tiles — half the HBM bytes at ZERO extra PCG
    iterations (validated by CPU bf16 emulation: 135 vs 134 iters on the
    demo level-0 system); CG's A@p stays float32;
  * the multigrid transfers P0 / P0^T are themselves Pallas rectangular
    block-ELL operators with static (bf16) values;
  * nu=2 damped-Jacobi smoothing — the measured best fine-matvec economy
    (scripts/exp_mg.py: nu2 cycle = 134 iters x 5 fine matvecs vs
    nu4 = 120 x 9).

Pattern packs are static per problem and cached by the caller; per-level
revaluation is one device scatter-add per operator.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax

from meshopticalflow_tpu.kernels.pallas_spmv import (
    BlockEllPattern, PallasEll, _revalue_pair, from_tiles, from_tiles_multi,
    inv_diag_tiles, pack_pattern, tile_cols_dev, to_tiles, to_tiles_multi)
from meshopticalflow_tpu.solvers.cg import CGStats


def _csr_to_padded_ell(mat: sp.spmatrix):
    """(cols (n, W) int32, vals (n, W) f64) padded with row-0-target zeros."""
    csr = sp.csr_matrix(mat)
    csr.sort_indices()
    n = csr.shape[0]
    nnz = np.diff(csr.indptr)
    w = max(int(nnz.max()), 1)
    cols = np.zeros((n, w), np.int64)
    vals = np.zeros((n, w), np.float64)
    rows = np.repeat(np.arange(n), nnz)
    slots = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], nnz)
    cols[rows, slots] = csr.indices
    vals[rows, slots] = csr.data
    # Padding targets the row's first real column (value 0, in-pattern).
    first = np.where(nnz > 0, cols[:, 0], 0)
    pad = np.arange(w)[None, :] >= nnz[:, None]
    cols = np.where(pad, first[:, None], cols)
    return cols.astype(np.int32), vals


@dataclasses.dataclass
class MGPack:
    """Static (per-problem) pattern packs and transfer operators."""

    fine_pat: BlockEllPattern
    fine_slots: jnp.ndarray
    fine_perm: jnp.ndarray
    fine_inv_perm: jnp.ndarray
    c1_pat: BlockEllPattern
    c1_slots: jnp.ndarray
    c1_perm: jnp.ndarray
    c1_inv_perm: jnp.ndarray
    p0: PallasEll          # fine <- c1 prolongation (bf16 static values)
    p0t: PallasEll         # c1 <- fine restriction (bf16 static values)
    p12_idx_p: jnp.ndarray  # (n1, K12) patch transfer with rows in c1
    p12_wt_p: jnp.ndarray   # permuted order
    n_fine: int
    n1: int
    n2: int
    interpret: bool = False
    # Stable per-problem artifact key ("" for ad-hoc packs): the disk
    # identity used to persist pinned refinement schedules across
    # processes (models/base.py).
    cache_key: str = ""
    # Runtime registry uid (declared, not setattr'd ad hoc): assigned by
    # _register_pack on first solver construction; None until then.
    uid: object = dataclasses.field(default=None, repr=False, compare=False)

    @property
    def fine_nr(self) -> int:
        return self.fine_pat.nr

    @property
    def c1_nr(self) -> int:
        return self.c1_pat.nr


def _build_mg_pack_host(fine_ell_cols: np.ndarray, c1_ell_cols: np.ndarray,
                        p0_csr: sp.spmatrix, p12_idx: np.ndarray,
                        p12_wt: np.ndarray) -> dict:
    """Host-side pattern packing (the cacheable part, ~1 min at N=325k)."""
    from meshopticalflow_tpu.ops.bsr import rcm_permutation

    n_f, w_f = fine_ell_cols.shape
    n1, w1 = c1_ell_cols.shape
    patt = sp.csr_matrix(
        (np.ones(n_f * w_f), (np.repeat(np.arange(n_f), w_f),
                              np.asarray(fine_ell_cols).ravel())), shape=(n_f, n_f))
    fine_perm = np.asarray(rcm_permutation(patt))
    inv_fp = np.empty(n_f, np.int64)
    inv_fp[fine_perm] = np.arange(n_f)
    # The c1 ordering must CORRELATE with the fine ordering, or the transfer
    # operators' blocks scatter (measured K~56 vs ~3 correlated): order
    # coarse DoFs by the mean permuted-fine position of their P0 footprint.
    p0_c = sp.csr_matrix(p0_csr)
    pt = p0_c.T.tocsr()
    nnz1 = np.diff(pt.indptr)
    sums = np.add.reduceat(
        inv_fp[pt.indices].astype(np.float64),
        np.minimum(pt.indptr[:-1], max(pt.nnz - 1, 0)))
    score = np.where(nnz1 > 0, sums / np.maximum(nnz1, 1), 0.0)
    c1_perm = np.argsort(score, kind="stable")

    fine_pat = pack_pattern(np.asarray(fine_ell_cols), fine_perm)
    c1_pat = pack_pattern(np.asarray(c1_ell_cols), c1_perm)
    p0_cols, p0_vals = _csr_to_padded_ell(p0_c)
    p0_pat = pack_pattern(p0_cols, fine_perm, col_perm=c1_perm, col_n=n1)
    p0t_cols, p0t_vals = _csr_to_padded_ell(p0_c.T.tocsr())
    p0t_pat = pack_pattern(p0t_cols, c1_perm, col_perm=fine_perm, col_n=n_f)

    def pat_dict(tag, pat):
        d = {f"{tag}_slots": pat.slots,
             f"{tag}_row_perm": pat.row_perm, f"{tag}_col_perm": pat.col_perm,
             f"{tag}_dims": np.asarray([pat.row_n, pat.col_n]),
             f"{tag}_row_sort": pat.row_sort,
             f"{tag}_nbuckets": np.asarray([len(pat.tile_cols)])}
        for i, tc in enumerate(pat.tile_cols):
            d[f"{tag}_btc{i}"] = tc
        return d

    out = {}
    for tag, pat in (("fine", fine_pat), ("c1", c1_pat), ("p0", p0_pat),
                     ("p0t", p0t_pat)):
        out.update(pat_dict(tag, pat))
    out.update(p0_vals=p0_vals, p0t_vals=p0t_vals,
               p12_idx_p=np.asarray(p12_idx)[c1_perm],
               p12_wt_p=np.asarray(p12_wt)[c1_perm])
    return out


# Process-level device-resident packs, keyed by artifact key: repeated
# problem constructions over the same mesh (e.g. the bench's interleaved
# draws, or a server aligning many pairs) reuse the uploaded pattern/tile
# arrays instead of re-packing and re-uploading ~1 GB per construction.
_DEVICE_PACKS: Dict[str, MGPack] = {}


def build_mg_pack(fine_ell_cols: np.ndarray, c1_ell_cols: np.ndarray,
                  p0_csr: sp.spmatrix, p12_idx: np.ndarray,
                  p12_wt: np.ndarray, n2: int,
                  interpret: bool = False,
                  cache_key: str = "") -> MGPack:
    """Pack the static patterns (host, cached on disk per problem) and
    stand up the device-side transfer operators."""
    from meshopticalflow_tpu.utils.artifacts import cached

    if cache_key and not interpret and cache_key in _DEVICE_PACKS:
        return _DEVICE_PACKS[cache_key]

    d = cached("mgpack3", cache_key,
               lambda: _build_mg_pack_host(fine_ell_cols, c1_ell_cols, p0_csr,
                                           p12_idx, p12_wt),
               enabled=bool(cache_key))

    def pat_from(tag):
        dims = d[f"{tag}_dims"]
        nb = int(d[f"{tag}_nbuckets"][0])
        tcs = tuple(np.asarray(d[f"{tag}_btc{i}"], np.int32)
                    for i in range(nb))
        row_sort = np.asarray(d[f"{tag}_row_sort"], np.int64)
        row_unsort = np.empty(len(row_sort), np.int64)
        row_unsort[row_sort] = np.arange(len(row_sort))
        return BlockEllPattern(
            tile_cols=tcs,
            slots=np.asarray(d[f"{tag}_slots"], np.int64),
            row_perm=np.asarray(d[f"{tag}_row_perm"]),
            col_perm=np.asarray(d[f"{tag}_col_perm"]),
            row_n=int(dims[0]), col_n=int(dims[1]),
            row_sort=row_sort, row_unsort=row_unsort)

    fine_pat, c1_pat = pat_from("fine"), pat_from("c1")
    p0_pat, p0t_pat = pat_from("p0"), pat_from("p0t")
    n_f, n1 = fine_pat.row_n, c1_pat.row_n
    p0_op = PallasEll.from_ell_values(p0_pat, jnp.asarray(p0_pat.slots),
                                      jnp.asarray(d["p0_vals"], jnp.float32),
                                      dtype=jnp.bfloat16, interpret=interpret)
    p0t_op = PallasEll.from_ell_values(p0t_pat, jnp.asarray(p0t_pat.slots),
                                       jnp.asarray(d["p0t_vals"], jnp.float32),
                                       dtype=jnp.bfloat16, interpret=interpret)
    inv_f = np.empty(n_f, np.int64)
    inv_f[fine_pat.row_perm] = np.arange(n_f)
    inv_1 = np.empty(n1, np.int64)
    inv_1[c1_pat.row_perm] = np.arange(n1)
    pack = MGPack(
        fine_pat=fine_pat, fine_slots=jnp.asarray(fine_pat.slots),
        fine_perm=jnp.asarray(fine_pat.row_perm, jnp.int32),
        fine_inv_perm=jnp.asarray(inv_f, jnp.int32),
        c1_pat=c1_pat, c1_slots=jnp.asarray(c1_pat.slots),
        c1_perm=jnp.asarray(c1_pat.row_perm, jnp.int32),
        c1_inv_perm=jnp.asarray(inv_1, jnp.int32),
        p0=p0_op, p0t=p0t_op,
        p12_idx_p=jnp.asarray(d["p12_idx_p"], jnp.int32),
        p12_wt_p=jnp.asarray(np.asarray(d["p12_wt_p"], np.float32)),
        n_fine=n_f, n1=n1, n2=n2, interpret=interpret,
        cache_key=cache_key)
    if cache_key and not interpret:
        if len(_DEVICE_PACKS) >= 4:   # bound resident packs (~1 GB each)
            _DEVICE_PACKS.pop(next(iter(_DEVICE_PACKS)))
        _DEVICE_PACKS[cache_key] = pack
    return pack


# ----------------------------------------------------------------------------
# The chunked PCG (one jit; all state in tile layout)
# ----------------------------------------------------------------------------

def _jac(op_apply, inv_diag_t, r_t, z_t, omega, nu):
    for _ in range(nu):
        z_t = z_t + omega * inv_diag_t * (r_t - op_apply(z_t))
    return z_t


def _inner1(c1_bf, c1_invd, chol2, pack: MGPack, r1, omega, nu: int):
    """Symmetric 2-level cycle on the coarse-1 system (Jacobi + patch-exact).

    Equal pre/post counts of the same stationary smoother around an SPD
    coarsest correction, so the whole thing is a fixed SPD operator — safe
    both directly inside PCG's V-cycle and as the preconditioner of a
    Chebyshev polynomial (which preserves SPD-ness for real polynomials
    positive on the spectrum).
    """
    z1 = _jac(c1_bf.apply, c1_invd, r1, omega * c1_invd * r1, omega, nu - 1)
    res1 = r1 - c1_bf.apply(z1)
    # Patch restriction: small (n1 x n2) segment ops on the flat c1 vector.
    res1_flat = res1.reshape(-1)[: pack.n1]
    r2 = jax.ops.segment_sum((pack.p12_wt_p * res1_flat[:, None]).ravel(),
                             pack.p12_idx_p.ravel(), num_segments=pack.n2)
    e2 = jax.scipy.linalg.cho_solve((chol2, True), r2[:, None])[:, 0]
    corr = jnp.sum(pack.p12_wt_p * e2[pack.p12_idx_p], axis=1)
    z1 = z1 + jnp.zeros_like(res1).reshape(-1).at[: pack.n1].set(corr).reshape(res1.shape)
    return _jac(c1_bf.apply, c1_invd, r1, z1, omega, nu)


@dataclasses.dataclass
class BandedC1:
    """Static handle for the EXACT banded-Cholesky coarse-1 solve
    (solvers/banded.py) in the MG cycle's tile space.

    tile_to_band / band_to_tile are the composed gather maps between the
    c1 TILE flat order (pack.c1_pat.row_perm) and the band's RCM order, so
    the solve plugs into the cycle with two cheap gathers. The per-level
    factorization itself is held by the solver as panelized (dinv, pbelow)
    arrays (values change per Gauss-Newton level; the pattern and maps are
    static and artifact-cached)."""

    slots: jnp.ndarray          # ELL-entry -> band slot map (static)
    tile_to_band: jnp.ndarray   # (m*nb,) band row i <- c1-tile flat index
    band_to_tile: jnp.ndarray   # (n1,) tile flat j <- band row index
    nb: int
    bw: int
    m: int
    n1: int


def build_c1_band(pack: MGPack, c1_ell_cols: np.ndarray, nb: int = 128,
                  cache_key: str = "") -> BandedC1:
    """Band layout for the c1 system + composed tile<->band maps."""
    from meshopticalflow_tpu.solvers.banded import build_band_pattern
    from meshopticalflow_tpu.utils.artifacts import cached

    def compute():
        pat = build_band_pattern(np.asarray(c1_ell_cols), nb=nb)
        return dict(slots=pat.slots, perm=pat.perm, inv_perm=pat.inv_perm,
                    dims=np.asarray([pat.nb, pat.bw, pat.m, pat.n]))

    d = cached("c1band", cache_key, compute, enabled=bool(cache_key))
    nb_, bw, m, n1 = (int(x) for x in d["dims"])
    inv_c1 = np.empty(n1, np.int64)
    inv_c1[np.asarray(pack.c1_pat.row_perm)] = np.arange(n1)
    band_perm = np.asarray(d["perm"])
    band_inv = np.asarray(d["inv_perm"])
    # pad band rows beyond n1 (m*nb >= n1) to gather a zeroed tail slot
    t2b = np.full(m * nb_, n1, np.int64)
    t2b[:n1] = inv_c1[band_perm]
    b2t = band_inv[np.asarray(pack.c1_pat.row_perm)]
    return BandedC1(slots=jnp.asarray(d["slots"]),
                    tile_to_band=jnp.asarray(t2b, jnp.int32),
                    band_to_tile=jnp.asarray(b2t, jnp.int32),
                    nb=nb_, bw=bw, m=m, n1=n1)


def _inner1_exact(dinv, pbelow, band: BandedC1, r1):
    """z1 = A1^{-1} r1 through the PANELIZED banded factorization
    (solvers/banded.py build_solve_panels: preinverted S x S diagonal
    panels turn each scan step into two dense matmuls and cut the
    sequential step count ~k-fold vs the nb=128 band scan — the solve is
    pure latency, applied once per outer PCG iteration); r1 in tile space.

    Handles both the single-rhs (nr1, 128) and multi-rhs (nr1, 8, 128)
    tile layouts."""
    from meshopticalflow_tpu.solvers.banded import (panel_lower_solve,
                                                    panel_upper_solve)

    multi = r1.ndim == 3
    if multi:
        flat = r1.transpose(0, 2, 1).reshape(-1, 8)       # (nr1*128, 8)
    else:
        flat = r1.reshape(-1)[:, None]                     # (nr1*128, 1)
    c = flat.shape[1]
    flat_pad = jnp.concatenate([flat, jnp.zeros((1, c), flat.dtype)], axis=0)
    rhs = flat_pad[band.tile_to_band]                      # (m*nb, c)
    mp, s, _ = dinv.shape
    pad = mp * s - rhs.shape[0]
    if pad:
        rhs = jnp.concatenate([rhs, jnp.zeros((pad, c), rhs.dtype)], axis=0)
    y = panel_lower_solve(dinv, pbelow, rhs.reshape(mp, s, c))
    x = panel_upper_solve(dinv, pbelow, y)
    x_flat = x.reshape(mp * s, c)
    x_tile = x_flat[band.band_to_tile]                     # (n1, c)
    nfull = flat.shape[0]
    out = jnp.zeros((nfull, c), x_tile.dtype).at[: band.n1].set(x_tile)
    if multi:
        nr1 = r1.shape[0]
        return out.reshape(nr1, 128, 8).transpose(0, 2, 1)
    return out[:, 0].reshape(r1.shape)


def _cycle(fine_bf, f_invd, c1_bf, c1_invd, chol2, pack: MGPack, r_t, omega,
           nu: int, cheb_k: int = 1, cheb_lmin=0.02, cheb_lmax=1.05):
    """Symmetric V-cycle in tile space; all matvecs bf16 Pallas.

    cheb_k=1 is the plain 3-level V. cheb_k>1 replaces the single inner
    coarse-1 cycle with a k-step Chebyshev polynomial in (inner1 o A1) —
    a strong coarse-1 solve built from k more of the SAME cheap inner
    cycles (each ~0.19x a fine matvec at demo scale). Measured on the demo
    flow system (scripts/exp_mg.py): outer PCG iterations drop 134 -> 88
    (k=4). (cheb_lmin, cheb_lmax) must COVER the spectrum of the
    preconditioned coarse operator — Chebyshev polynomials blow up below a
    too-high lmin (k=6 with lmin=0.02 measured WORSE than the plain V at
    demo scale, where the true lmin < 0.02) — so the solver estimates them
    per system with on-device power iterations (_cheb_bounds_impl).
    """
    z = _jac(fine_bf.apply, f_invd, r_t, omega * f_invd * r_t, omega, nu - 1)
    res = r_t - fine_bf.apply(z)
    r1 = pack.p0t.apply(res)                      # c1 tiles
    if cheb_k <= 1:
        z1 = _inner1(c1_bf, c1_invd, chol2, pack, r1, omega, nu)
    else:
        theta = (cheb_lmax + cheb_lmin) / 2.0
        delta = (cheb_lmax - cheb_lmin) / 2.0
        d_vec = _inner1(c1_bf, c1_invd, chol2, pack, r1, omega, nu) / theta
        z1 = d_vec
        alpha_prev = 1.0 / theta
        for _ in range(cheb_k - 1):
            res1 = r1 - c1_bf.apply(z1)
            beta = (delta * alpha_prev / 2.0) ** 2
            alpha = 1.0 / (theta - beta / alpha_prev)
            d_vec = (alpha * _inner1(c1_bf, c1_invd, chol2, pack, res1,
                                     omega, nu)
                     + (alpha * beta / alpha_prev) * d_vec)
            z1 = z1 + d_vec
            alpha_prev = alpha
    z = z + pack.p0.apply(z1)
    return _jac(fine_bf.apply, f_invd, r_t, z, omega, nu)


def _factor_c1_panels(c1_band: BandedC1, c1_ell_vals, c1_diag,
                      bf16: bool = False, defer_check: bool = False):
    """Factor the c1 system on its band layout and reblock into solve
    panels. Returns (dinv, pbelow, ok_dev); (None, None, None) on total
    breakdown (caller falls back to the 3-level cycle).

    ``bf16`` stores the solve panels in bfloat16: the banded factor is the
    single largest per-iteration stream of the exact-c1 MG cycle (two
    ~bw*n1 passes per outer PCG iteration, ~0.5 GB at the 2K bench shape),
    and as a PRECONDITIONER component a ~1e-2-accurate coarse solve is
    still far stronger than the Chebyshev fallback; iterative refinement
    owns the trajectory either way. Factorization always runs f32.

    ``defer_check=True`` skips the per-factorization ``bool(ok)`` host
    fetch (~0.1-0.3 s over the tunnel, paid EVERY level by both the flow
    and the smoothing solver): the shift-0 attempt is returned immediately
    with ``ok_dev`` as an unfetched device scalar, and the solver
    piggybacks the check onto its first chunk's r2 fetch — breakdown then
    costs one escalating re-factorization exactly like the eager path,
    while the (universal in production) success path saves the fetch."""
    from meshopticalflow_tpu.solvers.banded import (band_cholesky,
                                                    band_revalue,
                                                    build_solve_panels)

    s_blocks = band_revalue(c1_band.slots, c1_ell_vals,
                            c1_band.m, c1_band.nb, c1_band.bw, c1_band.n1)

    def panels(l_blocks):
        # Widest panel the band admits: S=1024 measured 6x faster per
        # triangular solve than S=512 on the 60k/bw=1024 systems (the
        # scan is latency-bound, so fewer+fatter steps win; panel
        # memory doubles to ~0.5 GB f32 at bench scale).
        k = max(1, min(8, c1_band.bw // c1_band.nb))
        dinv, pbelow = build_solve_panels(l_blocks, k)
        if bf16:
            dinv = dinv.astype(jnp.bfloat16)
            pbelow = pbelow.astype(jnp.bfloat16)
        return dinv, pbelow

    # The shift scale is only needed after a FAILED first attempt — SPD
    # systems (every production level) succeed at shift 0, so fetching
    # max|diag| eagerly was a wasted host round trip per factorization.
    dmax = None
    for rel in (0.0, 1e-6, 1e-4, 1e-2):
        if rel != 0.0 and dmax is None:
            dmax = float(jnp.max(jnp.abs(c1_diag)))
        l_blocks, ok = band_cholesky(s_blocks,
                                     jnp.float32(rel * (dmax or 0.0)),
                                     c1_band.nb, c1_band.bw)
        if rel == 0.0 and defer_check:
            dinv, pbelow = panels(l_blocks)
            return dinv, pbelow, ok
        if bool(ok):
            dinv, pbelow = panels(l_blocks)
            return dinv, pbelow, ok
    return None, None, None


def _refactor_c1_checked(solver):
    """Escalated (eager) re-factorization after a deferred shift-0 failure;
    swaps the shifted factor into the solver or raises BandedBreakdownError
    on total breakdown (callers rebuild with the 3-level fallback)."""
    band, vals, diag, bf16 = solver._c1_factor_args
    dinv, pbelow, _ = _factor_c1_panels(band, vals, diag, bf16=bf16)
    if dinv is None:
        solver.c1_dinv = None
        solver.c1_pbelow = None
        raise BandedBreakdownError(
            "banded c1 factorization failed at every shift")
    solver.c1_dinv, solver.c1_pbelow = dinv, pbelow


def _band_from_args(t2b, b2t) -> BandedC1:
    """Reconstruct the static band metadata from argument shapes (all
    shape-derived, so this is jit-trace-safe without a registry)."""
    return BandedC1(slots=None, tile_to_band=t2b, band_to_tile=b2t,
                    nb=0, bw=0, m=0, n1=b2t.shape[0])


def _cheb_smooth(apply_, invd, r, z0, deg: int, lmin, lmax):
    """Chebyshev semi-iteration on D^-1 A over [lmin, lmax]; z0=None starts
    from zero (skipping the first matvec). deg matvecs when z0 is given,
    deg-1 from zero — so a symmetric pre/post pair at deg=2 streams the
    SAME 4 fine-operator passes as nu=2 damped Jacobi."""
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    res = r if z0 is None else r - apply_(z0)
    d_vec = invd * res / theta
    z = d_vec if z0 is None else z0 + d_vec
    alpha_prev = 1.0 / theta
    for _ in range(deg - 1):
        res = r - apply_(z)
        beta = (delta * alpha_prev / 2.0) ** 2
        alpha = 1.0 / (theta - beta / alpha_prev)
        d_vec = alpha * (invd * res) + (alpha * beta / alpha_prev) * d_vec
        z = z + d_vec
        alpha_prev = alpha
    return z


def _cycle_exact(fine_bf, f_invd, dinv, pbelow, band: BandedC1, pack: MGPack,
                 r_t, omega, nu: int, cheb_deg: int = 0,
                 f_lmin=None, f_lmax=None):
    """Two-level V-cycle with the EXACT banded c1 solve — the measured
    ~59-iteration configuration (scripts/exp_mg.py mg2_exact_nu2) that the
    3-level Jacobi+patch cycle approximates at 236-304 iterations.

    ``cheb_deg`` > 0 replaces the damped-Jacobi smoothing with a
    Chebyshev polynomial over [f_lmin, f_lmax] of D^-1 A — stronger
    high-frequency damping at the same stream count for deg=2."""
    if cheb_deg > 0:
        z = _cheb_smooth(fine_bf.apply, f_invd, r_t, None, cheb_deg,
                         f_lmin, f_lmax)
    else:
        z = _jac(fine_bf.apply, f_invd, r_t, omega * f_invd * r_t, omega,
                 nu - 1)
    res = r_t - fine_bf.apply(z)
    r1 = pack.p0t.apply(res)
    z1 = _inner1_exact(dinv, pbelow, band, r1)
    z = z + pack.p0.apply(z1)
    if cheb_deg > 0:
        return _cheb_smooth(fine_bf.apply, f_invd, r_t, z, cheb_deg,
                            f_lmin, f_lmax)
    return _jac(fine_bf.apply, f_invd, r_t, z, omega, nu)


@functools.partial(jax.jit, static_argnames=("nu", "iters", "pack_id",
                                             "cheb_deg"))
def _pcg_chunk_banded_impl(fine_f32_tc, fine_f32_vals, fine_bf_tc,
                           fine_bf_vals, f_invd, dinv, pbelow, t2b, b2t,
                           p0_tc, p0_vals, p0t_tc, p0t_vals,
                           x, r, p, rz, omega, nu: int, iters: int, pack_id,
                           cheb_deg: int = 0, f_lmin=None, f_lmax=None):
    """PCG chunk with the banded-exact coarse cycle as preconditioner."""
    pack = _PACKS[pack_id]
    fine_bf = PallasEll(pack.fine_pat, fine_bf_tc, fine_bf_vals,
                        interpret=pack.interpret)
    fine_f32 = PallasEll(pack.fine_pat, fine_f32_tc, fine_f32_vals,
                         interpret=pack.interpret)
    pack = dataclasses.replace(
        pack, p0=PallasEll(pack.p0.pattern, p0_tc, p0_vals,
                           interpret=pack.interpret),
        p0t=PallasEll(pack.p0t.pattern, p0t_tc, p0t_vals,
                      interpret=pack.interpret))
    band = _band_from_args(t2b, b2t)

    def body(_, s):
        x, r, p, rz_old = s
        z = _cycle_exact(fine_bf, f_invd, dinv, pbelow, band, pack, r,
                         omega, nu, cheb_deg, f_lmin, f_lmax)
        rz = jnp.vdot(r, z)
        beta = jnp.where(rz_old != 0, rz / jnp.where(rz_old != 0, rz_old, 1.0), 0.0)
        p = z + beta * p
        ap = fine_f32.apply(p)
        pap = jnp.vdot(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        return (x + alpha * p, r - alpha * ap, p, rz)

    x, r, p, rz = lax.fori_loop(0, iters, body, (x, r, p, rz))
    r2 = jnp.vdot(r, r)
    return x, r, p, rz, r2


@functools.partial(jax.jit, static_argnames=("nu", "pack_id", "piters"))
def _cheb_bounds_impl(c1_bf_tc, c1_bf_vals, c1_invd, chol2,
                      p12_idx_p, p12_wt_p, omega, nu: int, pack_id,
                      piters: int = 20):
    """Spectral bounds of the _inner1-preconditioned coarse-1 operator.

    Power iteration for lmax of M1^-1 A1, then a shifted power iteration
    (s*I - M1^-1 A1) for lmin — both with the SAME bf16 matvecs the cycle
    uses, so the bounds describe the operator as actually applied. Cost is
    ~2*piters coarse-level cycles, once per solver construction (~2-3
    outer PCG iterations' worth of work).
    """
    pack = _PACKS[pack_id]
    c1_bf = PallasEll(pack.c1_pat, c1_bf_tc, c1_bf_vals,
                      interpret=pack.interpret)
    pack = dataclasses.replace(pack, p12_idx_p=p12_idx_p, p12_wt_p=p12_wt_p)

    def mv(v):
        return _inner1(c1_bf, c1_invd, chol2, pack, c1_bf.apply(v),
                       omega, nu)

    # Deterministic full-spectrum seed (no RNG under jit).
    seed = jnp.sin(0.7 * jnp.arange(c1_invd.size, dtype=jnp.float32) + 0.3)
    v = seed.reshape(c1_invd.shape)

    def pow_body(_, v):
        w = mv(v)
        return w / jnp.sqrt(jnp.vdot(w, w))

    v = lax.fori_loop(0, piters, pow_body, v / jnp.sqrt(jnp.vdot(v, v)))
    lmax = jnp.vdot(v, mv(v))
    s = 1.05 * lmax

    def shift_body(_, v):
        w = s * v - mv(v)
        return w / jnp.sqrt(jnp.vdot(w, w))

    v = lax.fori_loop(0, piters, shift_body, seed.reshape(c1_invd.shape))
    mu = jnp.vdot(v, s * v - mv(v))
    lmin = s - mu
    # Safety pad: lmin low (covering is what matters; Chebyshev only blows
    # up BELOW the interval), lmax high; clamp away degenerate estimates.
    lmax = jnp.where(jnp.isfinite(lmax) & (lmax > 0), 1.02 * lmax, 1.05)
    lmin = jnp.where(jnp.isfinite(lmin), 0.7 * lmin, 0.01 * lmax)
    lmin = jnp.clip(lmin, 1e-3 * lmax, 0.5 * lmax)
    return lmin, lmax


@functools.partial(jax.jit, static_argnames=("nu", "iters", "pack_id",
                                             "cheb_deg"))
def _fixed_first_impl(fine_f32_tc, fine_f32_vals, fine_bf_tc, fine_bf_vals,
                      f_invd, dinv, pbelow, t2b, b2t,
                      p0_tc, p0_vals, p0t_tc, p0t_vals,
                      b_f32, b_max, omega, nu: int, iters: int, pack_id,
                      cheb_deg: int = 0, f_lmin=None, f_lmax=None):
    """Pinned refinement round 1 as ONE program: scale, PCG(iters) from
    zero, df32 accumulate. Each removed dispatch saves ~50 ms of host-side
    enqueue latency on the tunneled runtime."""
    from meshopticalflow_tpu.solvers.df32 import df_update

    pack = _PACKS[pack_id]
    # b_max < 0 asks the program to compute the scale itself (max|b|) —
    # saving the caller's entry-norm fetch entirely.
    b_max = jnp.where(b_max >= 0, b_max, jnp.max(jnp.abs(b_f32)))
    scale = jnp.where(b_max > 0, b_max, jnp.float32(1.0))
    b_t = to_tiles(b_f32 / scale, pack.fine_perm, pack.fine_nr)
    zero_t = jnp.zeros_like(b_t)
    x_t, _r, _p, _rz, _r2 = _pcg_chunk_banded_impl(
        fine_f32_tc, fine_f32_vals, fine_bf_tc, fine_bf_vals, f_invd,
        dinv, pbelow, t2b, b2t, p0_tc, p0_vals, p0t_tc, p0t_vals,
        zero_t, b_t, zero_t, jnp.asarray(0.0, jnp.float32), omega, nu,
        iters, pack_id, cheb_deg, f_lmin, f_lmax)
    e = from_tiles(x_t, pack.fine_inv_perm, pack.n_fine)
    zero = jnp.zeros_like(b_f32)
    return df_update(zero, zero, e, scale)


@functools.partial(jax.jit, static_argnames=("nu", "iters", "pack_id",
                                             "mode", "cheb_deg"))
def _fixed_round_impl(cols, vals_f32, x_hi, x_lo, b_f32, prods,
                      fine_f32_tc, fine_f32_vals, fine_bf_tc, fine_bf_vals,
                      f_invd, dinv, pbelow, t2b, b2t,
                      p0_tc, p0_vals, p0t_tc, p0t_vals,
                      omega, nu: int, iters: int, pack_id, mode: str,
                      cheb_deg: int = 0, f_lmin=None, f_lmax=None):
    """One pinned refinement round fused into ONE program: compensated
    residual (from the separately materialized products — the only df32
    piece that NEEDS its own dispatch boundary), scale, PCG(iters), df32
    update. ``prods`` arrives as a program input, so the compiler cannot
    cancel the error-free transform's vals*x - p expression."""
    from meshopticalflow_tpu.solvers.df32 import (
        _ell_residual_scaled_from_products, df_update)

    r_scaled, stats = _ell_residual_scaled_from_products(
        cols, vals_f32, x_hi, x_lo, b_f32, prods, mode)
    pack = _PACKS[pack_id]
    r_t = to_tiles(r_scaled, pack.fine_perm, pack.fine_nr)
    zero_t = jnp.zeros_like(r_t)
    x_t, _r, _p, _rz, _r2 = _pcg_chunk_banded_impl(
        fine_f32_tc, fine_f32_vals, fine_bf_tc, fine_bf_vals, f_invd,
        dinv, pbelow, t2b, b2t, p0_tc, p0_vals, p0t_tc, p0t_vals,
        zero_t, r_t, zero_t, jnp.asarray(0.0, jnp.float32), omega, nu,
        iters, pack_id, cheb_deg, f_lmin, f_lmax)
    e = from_tiles(x_t, pack.fine_inv_perm, pack.n_fine)
    return df_update(x_hi, x_lo, e, stats[1])


@functools.partial(jax.jit, static_argnames=("pack_id", "piters"))
def _fine_lmax_impl(fine_bf_tc, fine_bf_vals, f_invd, pack_id,
                    piters: int = 15):
    """lambda_max of D^-1 A_fine by power iteration (bf16 matvecs, once per
    solver when the Chebyshev fine smoother is active)."""
    pack = _PACKS[pack_id]
    fine_bf = PallasEll(pack.fine_pat, fine_bf_tc, fine_bf_vals,
                        interpret=pack.interpret)

    def mv(v):
        return f_invd * fine_bf.apply(v)

    seed = jnp.sin(0.7 * jnp.arange(f_invd.size, dtype=jnp.float32) + 0.3)
    v = seed.reshape(f_invd.shape)
    v = v / jnp.sqrt(jnp.vdot(v, v))

    def body(_, v):
        w = mv(v)
        return w / jnp.sqrt(jnp.vdot(w, w))

    v = lax.fori_loop(0, piters, body, v)
    lmax = jnp.vdot(v, mv(v))
    return jnp.where(jnp.isfinite(lmax) & (lmax > 0), 1.05 * lmax,
                     jnp.asarray(2.0, jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("nu", "iters", "pack_id", "cheb_k"))
def _pcg_chunk_impl(fine_f32_tc, fine_f32_vals, fine_bf_tc, fine_bf_vals,
                    f_invd, c1_bf_tc, c1_bf_vals, c1_invd, chol2,
                    p0_tc, p0_vals, p0t_tc, p0t_vals,
                    p12_idx_p, p12_wt_p,
                    x, r, p, rz, omega, nu: int, iters: int, pack_id,
                    cheb_k: int = 1, cheb_lmin=0.02, cheb_lmax=1.05):
    """One chunk of PCG iterations; pack_id carries static metadata."""
    pack = _PACKS[pack_id]
    fine_bf = PallasEll(pack.fine_pat, fine_bf_tc, fine_bf_vals,
                        interpret=pack.interpret)
    fine_f32 = PallasEll(pack.fine_pat, fine_f32_tc, fine_f32_vals,
                         interpret=pack.interpret)
    c1_bf = PallasEll(pack.c1_pat, c1_bf_tc, c1_bf_vals,
                      interpret=pack.interpret)
    pack = dataclasses.replace(
        pack, p0=PallasEll(pack.p0.pattern, p0_tc, p0_vals,
                           interpret=pack.interpret),
        p0t=PallasEll(pack.p0t.pattern, p0t_tc, p0t_vals,
                      interpret=pack.interpret),
        p12_idx_p=p12_idx_p, p12_wt_p=p12_wt_p)

    def body(_, s):
        x, r, p, rz_old = s
        z = _cycle(fine_bf, f_invd, c1_bf, c1_invd, chol2, pack, r,
                   omega, nu, cheb_k, cheb_lmin, cheb_lmax)
        rz = jnp.vdot(r, z)
        beta = jnp.where(rz_old != 0, rz / jnp.where(rz_old != 0, rz_old, 1.0), 0.0)
        p = z + beta * p
        ap = fine_f32.apply(p)
        pap = jnp.vdot(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        return (x + alpha * p, r - alpha * ap, p, rz)

    x, r, p, rz = lax.fori_loop(0, iters, body, (x, r, p, rz))
    r2 = jnp.vdot(r, r)
    return x, r, p, rz, r2


# Registry of static pack metadata so the jitted chunk can close over
# patterns (shapes/slots) without retracing per solve. Values are weak:
# a dead pack drops out instead of pinning its (large) pattern arrays, and
# uids are never reused, so a recycled ``id()`` can't serve the wrong pack
# to a jitted chunk (the round-2 ``id(pack)`` keying could).
import itertools
import weakref

_PACKS: "weakref.WeakValueDictionary[int, MGPack]" = weakref.WeakValueDictionary()
_PACK_UIDS = itertools.count()


def _register_pack(pack: MGPack) -> int:
    """Stable unique id for a pack; idempotent so repeated solver
    constructions over the SAME pack object keep hitting the jit cache."""
    uid = pack.uid
    if uid is None or _PACKS.get(uid) is not pack:
        uid = next(_PACK_UIDS)
        pack.uid = uid
        _PACKS[uid] = pack
    return uid


def _next_chunk(r2, threshold, rho, chunk: int, rho_fast=None) -> int:
    """Adaptive PCG chunk sizing. The exit test runs once per chunk (a host
    round trip), so a fixed chunk overshoots convergence by up to chunk-1
    iterations — measured 48 recorded vs ~30 needed per refinement round at
    the 2K bench (scripts/exp_nu.py). Given the per-iteration squared-
    residual contraction ``rho`` observed on earlier chunks (the system is
    identical across a solve's chunks and nearly so across refinement
    rounds), size the next chunk to the predicted remaining iterations
    plus a small margin. Pure scheduling: the exit condition itself is
    unchanged, an undershoot just costs one more (small) chunk.

    Sizes are quantized to {4*chunk, 2*chunk, chunk, chunk/2, chunk/4} —
    the chunk length is a STATIC argument of the jitted PCG programs, and
    compiles cost tens of seconds on this backend (smaller chunks also
    raise the undershoot odds, each costing a whole extra dispatch).

    Shrinking guards with the pessimistic ``rho`` (the worst observed —
    undershoot costs a whole extra round trip). GROWING past ``chunk``
    guards with the OPTIMISTIC ``rho_fast`` (the best observed): a grown
    chunk only pays off if the solve needs at least that many iterations
    even at the fastest observed contraction, else the surplus iterations
    (~30 ms each) outweigh the ~0.1-0.3 s fetch they save."""
    import math

    if rho is None or not (0.0 < rho < 1.0) or r2 <= threshold or r2 <= 0:
        return chunk
    # 1.3x + 3 safety margin: an undershoot costs a whole extra dispatch +
    # host fetch (~0.1-0.3 s on the tunneled runtime), an overshoot only
    # the surplus iterations (~30 ms each) — err long.
    log_gap = math.log(threshold / r2)
    need = 1.3 * log_gap / math.log(rho) + 3.0
    for div in (4, 2):
        cand = max(chunk // div, 1)
        if cand >= need:
            return cand
    if rho_fast is not None and 0.0 < rho_fast < 1.0:
        need_fast = log_gap / math.log(rho_fast)
        for mult in (4, 2):
            if chunk * mult <= need_fast:
                return chunk * mult
    return chunk


# Most-recent solve's dispatch/fetch trail (observability): one record per
# chunk fetch — (iters, seconds, r2_after). The pipeline and the level
# profiler read it to attribute wall time to compute vs tunnel round trips.
_LAST_TRAIL = {"factor_s": None, "chunks": [], "entry_s": None}


class BandedBreakdownError(RuntimeError):
    """The banded c1 factorization failed at every shift of the escalation
    ladder (raised lazily at the first solve fetch under the deferred-check
    protocol). Callers rebuild with the 3-level Jacobi+patch fallback."""


@jax.jit
def _stack_scalars(a, b):
    return jnp.stack([a.astype(jnp.float32), b.astype(jnp.float32)])


def _update_rho(rho, r2_before, r2_after, iters: int):
    """Per-iteration squared-residual contraction estimate (None-safe).

    Keeps the WORST (largest) observed contraction: CG converges faster in
    early chunks than asymptotically, and a too-optimistic rho makes
    _next_chunk crawl to convergence in small dispatches."""
    if r2_before <= 0 or r2_after <= 0 or r2_after >= r2_before:
        return rho
    new = (r2_after / r2_before) ** (1.0 / max(iters, 1))
    return new if rho is None else max(rho, new)


def _update_rho_fast(rho_fast, r2_before, r2_after, iters: int):
    """Companion BEST (smallest) observed contraction — the optimistic
    bound _next_chunk uses to justify GROWING a chunk (see there)."""
    if r2_before <= 0 or r2_after <= 0 or r2_after >= r2_before:
        return rho_fast
    new = (r2_after / r2_before) ** (1.0 / max(iters, 1))
    return new if rho_fast is None else min(rho_fast, new)


# Contraction estimates persisted across solver constructions, keyed by
# (solver kind, pack uid): the level systems differ only in the data term
# and the decayed smoothing weight, so level L+1's first chunk can be sized
# from level L's measured contraction instead of a blind fixed chunk —
# each saved chunk boundary is a ~0.1-0.3 s tunnel round trip.
_RHO_BY_PACK: Dict[tuple, tuple] = {}


class PallasMG3Solver:
    """Drop-in ThreeLevelSolver equivalent on the Pallas kernels."""

    def __init__(self, pack: MGPack, fine_ell_vals, fine_diag,
                 c1_ell_vals, c1_diag, a2_dense,
                 omega: float = 0.7, nu: int = 2, cheb_k: int = 1,
                 c1_band: Optional[BandedC1] = None,
                 cheb_fine_deg: int = 0, c1_bf16: bool = False):
        self.pack = pack
        self.cheb_k = int(cheb_k)
        self.cheb_fine_deg = int(cheb_fine_deg)
        self._fine_bounds = None
        self.pack_id = _register_pack(pack)
        # Exact banded c1 factorization (per level: one scatter + one scan;
        # the escalating-shift retry costs one scalar fetch per attempt).
        # The factor is immediately reblocked into solve panels
        # (build_solve_panels) — the per-iteration triangular solves are
        # latency-bound scans, and the panel layout cuts their sequential
        # step count ~4x.
        self.c1_band = c1_band
        self.c1_dinv = None
        self.c1_pbelow = None
        self._c1_ok_dev = None
        self._c1_factor_args = None
        if c1_band is not None:
            import time as _time
            _t0 = _time.time()
            # Deferred ok-check: the success flag stays on device and rides
            # the first chunk's r2 fetch (shift-0 success is universal on
            # the production SPD systems; a failure costs one escalating
            # re-factorization there, exactly like the old eager ladder).
            self.c1_dinv, self.c1_pbelow, self._c1_ok_dev = _factor_c1_panels(
                c1_band, c1_ell_vals, c1_diag, bf16=c1_bf16,
                defer_check=True)
            self._c1_factor_args = (c1_band, c1_ell_vals, c1_diag, c1_bf16)
            _LAST_TRAIL["factor_s"] = round(_time.time() - _t0, 3)
            # on total breakdown fall back to the 3-level cycle (c1_dinv
            # stays None)
        dtype = jnp.float32
        tc_f = tile_cols_dev(pack.fine_pat)
        vf32, vbf = _revalue_pair(pack.fine_slots, fine_ell_vals,
                                  pack.fine_pat.bucket_sizes)
        self.fine_f32 = PallasEll(pack.fine_pat, tc_f, vf32,
                                  interpret=pack.interpret)
        self.fine_bf = PallasEll(pack.fine_pat, tc_f, vbf,
                                 interpret=pack.interpret)
        tc_1 = tile_cols_dev(pack.c1_pat)
        c32, cbf = _revalue_pair(pack.c1_slots, c1_ell_vals,
                                 pack.c1_pat.bucket_sizes)
        self.c1_f32 = PallasEll(pack.c1_pat, tc_1, c32,
                                interpret=pack.interpret)
        self.c1_bf = PallasEll(pack.c1_pat, tc_1, cbf,
                               interpret=pack.interpret)
        self.f_invd = inv_diag_tiles(fine_diag, pack.fine_perm, pack.fine_nr)
        self.c1_invd = inv_diag_tiles(c1_diag, pack.c1_perm, pack.c1_nr)
        # The dense patch coarsest is only needed by the 3-level fallback
        # cycle; with the banded-exact c1 active, callers skip building and
        # uploading it entirely (a2_dense=None).
        self.chol2 = None
        if a2_dense is not None:
            a2_dense = jnp.asarray(a2_dense)
            n2 = a2_dense.shape[0]
            eps = 1e-7 * jnp.max(jnp.abs(jnp.diagonal(a2_dense)))
            self.chol2 = jnp.linalg.cholesky(
                a2_dense + eps * jnp.eye(n2, dtype=a2_dense.dtype))
        if self.c1_dinv is None and self.chol2 is None and c1_band is None:
            # No solve path at all. (A PROVIDED c1_band that broke down is
            # legal: callers check c1_l_blocks and rebuild with a2_dense —
            # raising here would make their fallback branches unreachable.)
            raise ValueError("need a2_dense when no banded c1 factorization")
        self.omega = jnp.asarray(omega, dtype)
        self.nu = nu
        self._cheb_bounds = None
        # adaptive-chunk contraction estimates, carried across levels
        self._rho, self._rho_fast = _RHO_BY_PACK.get(("s", self.pack_id),
                                                     (None, None))

    @property
    def c1_l_blocks(self):
        """Back-compat flag: non-None iff the exact banded c1 path is
        active (the factor itself is stored panelized as c1_dinv /
        c1_pbelow)."""
        return self.c1_dinv

    @property
    def gb_per_iter(self) -> float:
        """Estimated HBM GB streamed per outer PCG iteration — operator
        tiles + banded factor only (vector traffic is <2% at these shapes).
        Feeds the pipeline's effective-bandwidth level metric so bandwidth
        regressions show up without a profiler (VERDICT r2 weak #9)."""
        return _solver_gb_per_iter(self)

    def fixed_first_round(self, b_f32, b_max, iters: int):
        """Pinned round 1 in ONE dispatch: scale b, run exactly ``iters``
        PCG iterations from zero, return the df32 iterate (x_hi, x_lo) in
        natural order. No host fetch."""
        deg, f_lmin, f_lmax = self._fixed_cheb()
        return _fixed_first_impl(
            self.fine_f32.tile_cols, self.fine_f32.vals_t,
            self.fine_bf.tile_cols, self.fine_bf.vals_t,
            self.f_invd, self.c1_dinv, self.c1_pbelow,
            self.c1_band.tile_to_band, self.c1_band.band_to_tile,
            self.pack.p0.tile_cols, self.pack.p0.vals_t,
            self.pack.p0t.tile_cols, self.pack.p0t.vals_t,
            b_f32, jnp.float32(b_max), self.omega, self.nu, iters,
            self.pack_id, deg, f_lmin, f_lmax)

    def fixed_next_round(self, cols, vals_f32, x_hi, x_lo, b_f32,
                         iters: int, mode: str):
        """One pinned refinement round in TWO dispatches: the df32 products
        (their own dispatch — solvers/df32.py FMA-contraction contract),
        then [compensated residual + scale + PCG(iters) + df32 update]
        fused into one program. No host fetch."""
        from meshopticalflow_tpu.solvers.df32 import _ell_products
        prods = _ell_products(cols, vals_f32, x_hi)
        deg, f_lmin, f_lmax = self._fixed_cheb()
        return _fixed_round_impl(
            cols, vals_f32, x_hi, x_lo, b_f32, prods,
            self.fine_f32.tile_cols, self.fine_f32.vals_t,
            self.fine_bf.tile_cols, self.fine_bf.vals_t,
            self.f_invd, self.c1_dinv, self.c1_pbelow,
            self.c1_band.tile_to_band, self.c1_band.band_to_tile,
            self.pack.p0.tile_cols, self.pack.p0.vals_t,
            self.pack.p0t.tile_cols, self.pack.p0t.vals_t,
            self.omega, self.nu, iters, self.pack_id, mode,
            deg, f_lmin, f_lmax)

    def _fixed_cheb(self):
        deg = self.cheb_fine_deg
        if deg > 0 and self._fine_bounds is None:
            lmax = _fine_lmax_impl(self.fine_bf.tile_cols,
                                   self.fine_bf.vals_t,
                                   self.f_invd, self.pack_id)
            self._fine_bounds = (lmax / 8.0, lmax)
        f_lmin, f_lmax = self._fine_bounds or (None, None)
        return deg, f_lmin, f_lmax

    def solve_fixed(self, b, iters: int):
        """Run EXACTLY ``iters`` PCG iterations from a zero start and
        return x (natural order) WITHOUT any host fetch — the whole call
        is async dispatches. The pipelined refinement (solvers/refine.py
        fixed-schedule path) chains two of these around an on-device df32
        residual so a full two-round level solve costs TWO host round
        trips (entry + final check) instead of the adaptive loop's ~7
        (round-4 dispatch economy; each fetch is ~0.1-0.3 s on the
        tunneled runtime). Banded-exact path only; ``iters`` should come
        from the {24, 48, 96} ladder so the chunk program is one of the
        already-compiled shapes."""
        if self.c1_dinv is None:
            raise RuntimeError("solve_fixed requires the banded c1 path")
        pack = self.pack
        b_t = to_tiles(b.astype(jnp.float32), pack.fine_perm, pack.fine_nr)
        x = jnp.zeros_like(b_t)
        p = jnp.zeros_like(b_t)
        rz = jnp.asarray(0.0, jnp.float32)
        deg = self.cheb_fine_deg
        if deg > 0 and self._fine_bounds is None:
            lmax = _fine_lmax_impl(self.fine_bf.tile_cols,
                                   self.fine_bf.vals_t,
                                   self.f_invd, self.pack_id)
            self._fine_bounds = (lmax / 8.0, lmax)
        f_lmin, f_lmax = self._fine_bounds or (None, None)
        x, _r, _p, _rz, _r2 = _pcg_chunk_banded_impl(
            self.fine_f32.tile_cols, self.fine_f32.vals_t,
            self.fine_bf.tile_cols, self.fine_bf.vals_t,
            self.f_invd, self.c1_dinv, self.c1_pbelow,
            self.c1_band.tile_to_band, self.c1_band.band_to_tile,
            pack.p0.tile_cols, pack.p0.vals_t,
            pack.p0t.tile_cols, pack.p0t.vals_t,
            x, b_t, p, rz, self.omega, self.nu, iters, self.pack_id,
            deg, f_lmin, f_lmax)
        return from_tiles(x, pack.fine_inv_perm, pack.n_fine)

    def cheb_bounds(self):
        """(lmin, lmax) of the inner1-preconditioned coarse operator,
        estimated once per solver on device (device scalars)."""
        if self._cheb_bounds is None:
            self._cheb_bounds = _cheb_bounds_impl(
                self.c1_bf.tile_cols, self.c1_bf.vals_t, self.c1_invd,
                self.chol2, self.pack.p12_idx_p, self.pack.p12_wt_p,
                self.omega, self.nu, self.pack_id)
        return self._cheb_bounds

    def solve(self, b, x0: Optional[jnp.ndarray] = None, tol: float = 1e-6,
              max_iters: int = 200, chunk: int = 24,
              b_norm2: Optional[float] = None):
        pack = self.pack
        if self.c1_dinv is None and self.chol2 is None:
            raise RuntimeError(
                "banded c1 factorization broke down; rebuild with a2_dense")
        if self.cheb_k > 1 and self.c1_l_blocks is None:
            cheb_lmin, cheb_lmax = self.cheb_bounds()
        else:
            cheb_lmin = cheb_lmax = jnp.asarray(1.0, jnp.float32)
        b_t = to_tiles(b.astype(jnp.float32), pack.fine_perm, pack.fine_nr)
        # Caller-known ||b||^2 skips a device fetch (~0.1-0.3 s each on the
        # tunneled runtime; the refinement loop calls solve() every round).
        if b_norm2 is None:
            b_norm2 = float(jnp.vdot(b_t, b_t))
        if b_norm2 == 0:
            return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                              jnp.asarray(0.0, b.dtype))
        if x0 is None:
            x = jnp.zeros_like(b_t)
            r = b_t
        else:
            x = to_tiles(x0.astype(jnp.float32), pack.fine_perm, pack.fine_nr)
            r = b_t - self.fine_f32.apply(x)
        p = jnp.zeros_like(b_t)
        rz = jnp.asarray(0.0, jnp.float32)
        threshold = (tol ** 2) * b_norm2
        done = 0
        r2 = b_norm2
        undershot = False
        import time as _time
        # Accumulate across solve() calls (refinement rounds); a "solve"
        # marker separates rounds. Callers (profiler / level metrics) clear.
        _chunks_trail = _LAST_TRAIL["chunks"]
        _chunks_trail.append(("solve", round(float(tol), 10)))
        while done < max_iters and r2 > threshold:
            _t0 = _time.time()
            # After a failed short-chunk prediction, go straight back to the
            # full chunk — the rho estimate was wrong for this system.
            iters = chunk if undershot \
                else _next_chunk(r2, threshold, self._rho, chunk,
                                 self._rho_fast)
            iters = min(iters, max_iters - done)
            r2_before = r2
            if self.c1_dinv is not None:
                deg = self.cheb_fine_deg
                if deg > 0 and self._fine_bounds is None:
                    lmax = _fine_lmax_impl(self.fine_bf.tile_cols,
                                           self.fine_bf.vals_t,
                                           self.f_invd, self.pack_id)
                    self._fine_bounds = (lmax / 8.0, lmax)
                f_lmin, f_lmax = self._fine_bounds or (None, None)
                x, r, p, rz, r2_dev = _pcg_chunk_banded_impl(
                    self.fine_f32.tile_cols, self.fine_f32.vals_t,
                    self.fine_bf.tile_cols, self.fine_bf.vals_t,
                    self.f_invd, self.c1_dinv, self.c1_pbelow,
                    self.c1_band.tile_to_band, self.c1_band.band_to_tile,
                    pack.p0.tile_cols, pack.p0.vals_t,
                    pack.p0t.tile_cols, pack.p0t.vals_t,
                    x, r, p, rz, self.omega, self.nu, iters, self.pack_id,
                    deg, f_lmin, f_lmax)
            else:
                x, r, p, rz, r2_dev = _pcg_chunk_impl(
                    self.fine_f32.tile_cols, self.fine_f32.vals_t,
                    self.fine_bf.tile_cols, self.fine_bf.vals_t,
                    self.f_invd, self.c1_bf.tile_cols, self.c1_bf.vals_t,
                    self.c1_invd, self.chol2,
                    pack.p0.tile_cols, pack.p0.vals_t,
                    pack.p0t.tile_cols, pack.p0t.vals_t,
                    pack.p12_idx_p, pack.p12_wt_p,
                    x, r, p, rz, self.omega, self.nu, iters, self.pack_id,
                    self.cheb_k, cheb_lmin, cheb_lmax)
            if self._c1_ok_dev is not None and self.c1_dinv is not None:
                # Deferred factor check rides THIS (first) fetch — no
                # extra round trip on the universal success path.
                pair = np.asarray(_stack_scalars(r2_dev, self._c1_ok_dev))
                r2, c1_ok = float(pair[0]), bool(pair[1] > 0)
                self._c1_ok_dev = None
                if not c1_ok:
                    _refactor_c1_checked(self)   # raises on total breakdown
                    # restart the solve under the shifted factor
                    x = jnp.zeros_like(b_t) if x0 is None else \
                        to_tiles(x0.astype(jnp.float32), pack.fine_perm,
                                 pack.fine_nr)
                    r = b_t if x0 is None else b_t - self.fine_f32.apply(x)
                    p = jnp.zeros_like(b_t)
                    rz = jnp.asarray(0.0, jnp.float32)
                    done, r2, undershot = 0, b_norm2, False
                    continue
            else:
                r2 = float(r2_dev)
            done += iters
            _chunks_trail.append((iters, round(_time.time() - _t0, 3)))
            self._rho = _update_rho(self._rho, r2_before, r2, iters)
            self._rho_fast = _update_rho_fast(self._rho_fast, r2_before, r2,
                                              iters)
            _RHO_BY_PACK[("s", self.pack_id)] = (self._rho, self._rho_fast)
            undershot = iters < chunk and r2 > threshold
        rel = float(np.sqrt(max(r2, 0.0) / b_norm2))
        x_out = from_tiles(x, pack.fine_inv_perm, pack.n_fine).astype(b.dtype)
        return x_out, CGStats(jnp.asarray(done, jnp.int32),
                              jnp.asarray(rel, b.dtype))


def _solver_gb_per_iter(solver) -> float:
    """Shared streamed-bytes model for both Pallas MG solvers.

    Per outer PCG iteration the symmetric cycle streams the bf16 fine tiles
    2*nu times (nu-1 pre-smooth + residual + nu post-smooth), the f32 fine
    tiles once (CG's A@p), each transfer once, and either the banded c1
    factor twice (lower+upper solve) or 2*nu c1 tile streams per Chebyshev
    step of the 3-level fallback."""
    nu = solver.nu
    if getattr(solver, "cheb_fine_deg", 0) > 0 and solver.c1_dinv is not None:
        # The Chebyshev fine smoother only runs in the banded-exact cycle;
        # the 3-level fallback keeps Jacobi-nu streams.
        nu = solver.cheb_fine_deg   # 2*deg fine streams per cycle
    gb = (2 * nu * solver.fine_bf.gigabytes + solver.fine_f32.gigabytes
          + solver.pack.p0.gigabytes + solver.pack.p0t.gigabytes)
    if solver.c1_dinv is not None:
        gb += 2 * (solver.c1_dinv.size * solver.c1_dinv.dtype.itemsize
                   + solver.c1_pbelow.size * solver.c1_pbelow.dtype.itemsize) / 1e9
    else:
        k = max(int(getattr(solver, "cheb_k", 1)), 1)
        gb += k * 2 * nu * solver.c1_bf.gigabytes
    return gb


# ----------------------------------------------------------------------------
# Multi-rhs variant (the scalar smoothing solves: (M + wK) x = M s, C <= 8)
# ----------------------------------------------------------------------------

def _apply_multi(op: PallasEll, x_tiles):
    return op.apply_multi(x_tiles)


def _jac_m(op, inv_diag_t, r_t, z_t, omega, nu):
    for _ in range(nu):
        z_t = z_t + omega * inv_diag_t * (r_t - _apply_multi(op, z_t))
    return z_t


def _dots_m(u, v):
    """Per-channel dots over (nr, 8, 128) tiles -> (8,)."""
    return jnp.einsum("ncl,ncl->c", u, v)


def _cycle_m(fine_bf, f_invd, c1_bf, c1_invd, chol2, pack: MGPack, r_t,
             omega, nu: int):
    z = _jac_m(fine_bf, f_invd, r_t, omega * f_invd * r_t, omega, nu - 1)
    res = r_t - _apply_multi(fine_bf, z)
    r1 = _apply_multi(pack.p0t, res)
    z1 = _jac_m(c1_bf, c1_invd, r1, omega * c1_invd * r1, omega, nu - 1)
    res1 = r1 - _apply_multi(c1_bf, z1)
    res1_flat = res1.transpose(0, 2, 1).reshape(-1, 8)[: pack.n1]   # (n1, 8)
    r2 = jax.ops.segment_sum(
        (pack.p12_wt_p[:, :, None] * res1_flat[:, None, :]).reshape(-1, 8),
        jnp.repeat(pack.p12_idx_p.ravel(), 1), num_segments=pack.n2)
    e2 = jax.scipy.linalg.cho_solve((chol2, True), r2)
    corr = jnp.einsum("nk,nkc->nc", pack.p12_wt_p, e2[pack.p12_idx_p])
    nr1 = res1.shape[0]
    corr_t = jnp.zeros((nr1 * 128, 8), corr.dtype).at[: pack.n1].set(corr) \
        .reshape(nr1, 128, 8).transpose(0, 2, 1)
    z1 = z1 + corr_t
    z1 = _jac_m(c1_bf, c1_invd, r1, z1, omega, nu)
    z = z + _apply_multi(pack.p0, z1)
    return _jac_m(fine_bf, f_invd, r_t, z, omega, nu)


def _cycle_m_exact(fine_bf, f_invd, dinv, pbelow, band: BandedC1,
                   pack: MGPack, r_t, omega, nu: int):
    """Multi-rhs 2-level V-cycle with the exact banded c1 solve."""
    z = _jac_m(fine_bf, f_invd, r_t, omega * f_invd * r_t, omega, nu - 1)
    res = r_t - _apply_multi(fine_bf, z)
    r1 = _apply_multi(pack.p0t, res)
    z1 = _inner1_exact(dinv, pbelow, band, r1)
    z = z + _apply_multi(pack.p0, z1)
    return _jac_m(fine_bf, f_invd, r_t, z, omega, nu)


@functools.partial(jax.jit, static_argnames=("nu", "iters", "pack_id"))
def _pcg_chunk_multi_banded(fine_f32_tc, fine_f32_vals, fine_bf_tc,
                            fine_bf_vals, f_invd, dinv, pbelow, t2b, b2t,
                            p0_tc, p0_vals, p0t_tc, p0t_vals,
                            x, r, p, rz, omega, nu: int, iters: int, pack_id):
    pack = _PACKS[pack_id]
    fine_bf = PallasEll(pack.fine_pat, fine_bf_tc, fine_bf_vals,
                        interpret=pack.interpret)
    fine_f32 = PallasEll(pack.fine_pat, fine_f32_tc, fine_f32_vals,
                         interpret=pack.interpret)
    pack = dataclasses.replace(
        pack, p0=PallasEll(pack.p0.pattern, p0_tc, p0_vals,
                           interpret=pack.interpret),
        p0t=PallasEll(pack.p0t.pattern, p0t_tc, p0t_vals,
                      interpret=pack.interpret))
    band = _band_from_args(t2b, b2t)

    def body(_, s):
        x, r, p, rz_old = s
        z = _cycle_m_exact(fine_bf, f_invd, dinv, pbelow, band, pack, r,
                           omega, nu)
        rz = _dots_m(r, z)
        beta = jnp.where(rz_old != 0, rz / jnp.where(rz_old != 0, rz_old, 1.0), 0.0)
        p = z + beta[None, :, None] * p
        ap = _apply_multi(fine_f32, p)
        pap = _dots_m(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        a_ = alpha[None, :, None]
        return (x + a_ * p, r - a_ * ap, p, rz)

    x, r, p, rz = lax.fori_loop(0, iters, body, (x, r, p, rz))
    r2 = jnp.max(_dots_m(r, r))
    return x, r, p, rz, r2


@functools.partial(jax.jit, static_argnames=("nu", "iters", "pack_id"))
def _pcg_chunk_multi(fine_f32_tc, fine_f32_vals, fine_bf_tc, fine_bf_vals,
                     f_invd, c1_bf_tc, c1_bf_vals, c1_invd, chol2,
                     p0_tc, p0_vals, p0t_tc, p0t_vals,
                     p12_idx_p, p12_wt_p,
                     x, r, p, rz, omega, nu: int, iters: int, pack_id):
    pack = _PACKS[pack_id]
    fine_bf = PallasEll(pack.fine_pat, fine_bf_tc, fine_bf_vals,
                        interpret=pack.interpret)
    fine_f32 = PallasEll(pack.fine_pat, fine_f32_tc, fine_f32_vals,
                         interpret=pack.interpret)
    c1_bf = PallasEll(pack.c1_pat, c1_bf_tc, c1_bf_vals,
                      interpret=pack.interpret)
    pack = dataclasses.replace(
        pack, p0=PallasEll(pack.p0.pattern, p0_tc, p0_vals,
                           interpret=pack.interpret),
        p0t=PallasEll(pack.p0t.pattern, p0t_tc, p0t_vals,
                      interpret=pack.interpret),
        p12_idx_p=p12_idx_p, p12_wt_p=p12_wt_p)

    def body(_, s):
        x, r, p, rz_old = s
        z = _cycle_m(fine_bf, f_invd, c1_bf, c1_invd, chol2, pack, r,
                     omega, nu)
        rz = _dots_m(r, z)
        beta = jnp.where(rz_old != 0, rz / jnp.where(rz_old != 0, rz_old, 1.0), 0.0)
        p = z + beta[None, :, None] * p
        ap = _apply_multi(fine_f32, p)
        pap = _dots_m(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        a_ = alpha[None, :, None]
        return (x + a_ * p, r - a_ * ap, p, rz)

    x, r, p, rz = lax.fori_loop(0, iters, body, (x, r, p, rz))
    r2 = jnp.max(_dots_m(r, r))
    return x, r, p, rz, r2


class PallasMG3MultiSolver:
    """Multi-rhs (C <= 8) 3-level MG-PCG in tile space — the TPU solver for
    the scalar smoothing systems (FlowData::smoothSignal's per-level
    (M + wK) x = M s with 2C channel-stacked signals)."""

    def __init__(self, pack: MGPack, fine_ell_vals, fine_diag,
                 c1_ell_vals, c1_diag, a2_dense,
                 omega: float = 0.7, nu: int = 2,
                 c1_band: Optional[BandedC1] = None):
        self.pack = pack
        self.pack_id = _register_pack(pack)
        self.c1_band = c1_band
        self.c1_dinv = None
        self.c1_pbelow = None
        self._c1_ok_dev = None
        self._c1_factor_args = None
        if c1_band is not None:
            self.c1_dinv, self.c1_pbelow, self._c1_ok_dev = _factor_c1_panels(
                c1_band, c1_ell_vals, c1_diag, defer_check=True)
            self._c1_factor_args = (c1_band, c1_ell_vals, c1_diag, False)
        tc_f = tile_cols_dev(pack.fine_pat)
        vf32, vbf = _revalue_pair(pack.fine_slots, fine_ell_vals,
                                  pack.fine_pat.bucket_sizes)
        self.fine_f32 = PallasEll(pack.fine_pat, tc_f, vf32,
                                  interpret=pack.interpret)
        self.fine_bf = PallasEll(pack.fine_pat, tc_f, vbf,
                                 interpret=pack.interpret)
        tc_1 = tile_cols_dev(pack.c1_pat)
        c32, cbf = _revalue_pair(pack.c1_slots, c1_ell_vals,
                                 pack.c1_pat.bucket_sizes)
        self.c1_f32 = PallasEll(pack.c1_pat, tc_1, c32,
                                interpret=pack.interpret)
        self.c1_bf = PallasEll(pack.c1_pat, tc_1, cbf,
                               interpret=pack.interpret)
        self.f_invd = inv_diag_tiles(fine_diag, pack.fine_perm,
                                     pack.fine_nr)[:, None, :]
        self.c1_invd = inv_diag_tiles(c1_diag, pack.c1_perm,
                                      pack.c1_nr)[:, None, :]
        self.chol2 = None
        if a2_dense is not None:
            a2_dense = jnp.asarray(a2_dense)
            n2 = a2_dense.shape[0]
            eps = 1e-7 * jnp.max(jnp.abs(jnp.diagonal(a2_dense)))
            self.chol2 = jnp.linalg.cholesky(
                a2_dense + eps * jnp.eye(n2, dtype=a2_dense.dtype))
        if self.c1_dinv is None and self.chol2 is None and c1_band is None:
            raise ValueError("need a2_dense when no banded c1 factorization")
        self.omega = jnp.asarray(omega, jnp.float32)
        self.nu = nu
        # adaptive-chunk contraction estimates, carried across levels
        self._rho, self._rho_fast = _RHO_BY_PACK.get(("m", self.pack_id),
                                                     (None, None))

    @property
    def c1_l_blocks(self):
        """Back-compat flag: non-None iff the exact banded c1 path is
        active (the factor itself is stored panelized as c1_dinv /
        c1_pbelow)."""
        return self.c1_dinv

    @property
    def gb_per_iter(self) -> float:
        """Estimated HBM GB streamed per outer PCG iteration (the stream is
        independent of the number of right-hand sides — the multi-rhs
        economy)."""
        return _solver_gb_per_iter(self)

    def solve(self, b, x0: Optional[jnp.ndarray] = None, tol: float = 1e-7,
              max_iters: int = 200, chunk: int = 16,
              b_norm2: Optional[float] = None):
        pack = self.pack
        if self.c1_dinv is None and self.chol2 is None:
            raise RuntimeError(
                "banded c1 factorization broke down; rebuild with a2_dense")
        c = b.shape[1]
        b_t = to_tiles_multi(b.astype(jnp.float32), pack.fine_perm, pack.fine_nr)
        # Caller-known max column ||b||^2 skips a device fetch per call —
        # the smoothing stage's b is level-invariant, so it caches this.
        if b_norm2 is None:
            b_norm2 = float(jnp.max(_dots_m(b_t, b_t)))
        if b_norm2 == 0:
            return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                              jnp.asarray(0.0, b.dtype))
        if x0 is None:
            x = jnp.zeros_like(b_t)
            r = b_t
        else:
            x = to_tiles_multi(x0.astype(jnp.float32), pack.fine_perm,
                               pack.fine_nr)
            r = b_t - _apply_multi(self.fine_f32, x)
        p = jnp.zeros_like(b_t)
        rz = jnp.zeros(8, jnp.float32)
        threshold = (tol ** 2) * b_norm2
        done = 0
        r2 = b_norm2
        undershot = False
        while done < max_iters and r2 > threshold:
            iters = chunk if undershot \
                else _next_chunk(r2, threshold, self._rho, chunk,
                                 self._rho_fast)
            iters = min(iters, max_iters - done)
            r2_before = r2
            if self.c1_dinv is not None:
                x, r, p, rz, r2_dev = _pcg_chunk_multi_banded(
                    self.fine_f32.tile_cols, self.fine_f32.vals_t,
                    self.fine_bf.tile_cols, self.fine_bf.vals_t,
                    self.f_invd, self.c1_dinv, self.c1_pbelow,
                    self.c1_band.tile_to_band, self.c1_band.band_to_tile,
                    pack.p0.tile_cols, pack.p0.vals_t,
                    pack.p0t.tile_cols, pack.p0t.vals_t,
                    x, r, p, rz, self.omega, self.nu, iters, self.pack_id)
            else:
                x, r, p, rz, r2_dev = _pcg_chunk_multi(
                    self.fine_f32.tile_cols, self.fine_f32.vals_t,
                    self.fine_bf.tile_cols, self.fine_bf.vals_t,
                    self.f_invd, self.c1_bf.tile_cols, self.c1_bf.vals_t,
                    self.c1_invd, self.chol2,
                    pack.p0.tile_cols, pack.p0.vals_t,
                    pack.p0t.tile_cols, pack.p0t.vals_t,
                    pack.p12_idx_p, pack.p12_wt_p,
                    x, r, p, rz, self.omega, self.nu, iters, self.pack_id)
            if self._c1_ok_dev is not None and self.c1_dinv is not None:
                pair = np.asarray(_stack_scalars(r2_dev, self._c1_ok_dev))
                r2, c1_ok = float(pair[0]), bool(pair[1] > 0)
                self._c1_ok_dev = None
                if not c1_ok:
                    _refactor_c1_checked(self)   # raises on total breakdown
                    x = jnp.zeros_like(b_t) if x0 is None else \
                        to_tiles_multi(x0.astype(jnp.float32),
                                       pack.fine_perm, pack.fine_nr)
                    r = b_t if x0 is None else \
                        b_t - _apply_multi(self.fine_f32, x)
                    p = jnp.zeros_like(b_t)
                    rz = jnp.zeros(8, jnp.float32)
                    done, r2, undershot = 0, b_norm2, False
                    continue
            else:
                r2 = float(r2_dev)
            done += iters
            self._rho = _update_rho(self._rho, r2_before, r2, iters)
            self._rho_fast = _update_rho_fast(self._rho_fast, r2_before, r2,
                                              iters)
            _RHO_BY_PACK[("m", self.pack_id)] = (self._rho, self._rho_fast)
            undershot = iters < chunk and r2 > threshold
        rel = float(np.sqrt(max(r2, 0.0) / b_norm2))
        x_out = from_tiles_multi(x, pack.fine_inv_perm, pack.n_fine, c)
        return x_out.astype(b.dtype), CGStats(jnp.asarray(done, jnp.int32),
                                              jnp.asarray(rel, b.dtype))
