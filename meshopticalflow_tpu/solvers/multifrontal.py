"""Batched multifrontal Cholesky on nested-dissection schedules — the
direct per-level flow solve.

The reference amortizes ONE sparse Cholesky symbolic analysis across all
levels and refactorizes numerically per level (LinearSolvers.h:294-299,
EigenCholeskySolverLDLt::update). This module is that strategy rebuilt for
the MXU: the flow system's sparsity pattern (the union ELL of S and R D P,
models/base.py:66-95) is LEVEL-INVARIANT, so the nested-dissection ordering,
front structure, and every gather/scatter index table are computed ONCE per
problem on host (and disk-cached); each level is then a numeric
refactorization + triangular solves with fully static shapes.

Design (feasibility measured in scripts/exp_nd.py, bench_runs/
round4_exp_nd_2026-08-19.jsonl): geometric nested dissection (recursive
inertial bisection with vertex separators) yields closed-border fronts whose
exact factorization cost at production scale (n=324,600) is 23.5 GFLOPs /
48M nnz(L) — vs the 5.7 GB RCM band that was measured out (PROGRESS.md).
All fronts at one elimination-tree depth are padded to a common shape and
processed as ONE batched dense step (gather ELL rows -> scatter-assemble ->
extend-add children via row gathers -> batched Cholesky + triangular solve
+ Schur update), so a whole factorization is ~14 batched MXU stages inside
a single jit program — no data-dependent control flow, no per-front
dispatches.

The factor runs in f32; the per-level solve wraps it in the existing
compensated-f32 iterative refinement (solvers/refine.py) exactly like the
MG-PCG path, so the outer residual quality is unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def _pad8(x: int, minimum: int = 8) -> int:
    """Pad a front dimension up to a sublane-friendly multiple of 8."""
    return max(minimum, (x + 7) // 8 * 8)


def dof_positions(tris: np.ndarray, verts: np.ndarray, p_idx: np.ndarray,
                  n_coeffs: int) -> np.ndarray:
    """A 3D embedding per basis coefficient: the mean of the centroids of
    the triangles whose prolongation stencil touches it. Drives the
    inertial bisection only — quality affects fill, never correctness."""
    cent = np.asarray(verts)[np.asarray(tris)].mean(axis=1)   # (T, 3)
    pos = np.zeros((n_coeffs, 3))
    cnt = np.zeros(n_coeffs)
    p_idx = np.asarray(p_idx)
    for k in range(p_idx.shape[1]):
        np.add.at(pos, p_idx[:, k], cent)
        np.add.at(cnt, p_idx[:, k], 1.0)
    pos /= np.maximum(cnt, 1.0)[:, None]
    return pos


# ---------------------------------------------------------------------------
# Host symbolic analysis: nested dissection + closed-border fronts.
# ---------------------------------------------------------------------------

def nested_dissection(pattern: sp.csr_matrix, pos: np.ndarray, leaf: int):
    """Recursive inertial bisection with vertex separators on the DOF graph.

    Returns a node list of {depth, cols (global DOF ids eliminated at this
    node), parent, leaf}. Children of a node always sit at depth+1, so the
    elimination schedule is a strict depth-by-depth sweep."""
    nodes = []
    root_ids = np.arange(pattern.shape[0], dtype=np.int64)
    stack = [(pattern, root_ids, 0, -1)]
    while stack:
        g, ids, depth, parent = stack.pop()
        nid = len(nodes)
        if len(ids) <= leaf:
            nodes.append(dict(depth=depth, cols=ids, parent=parent, leaf=True))
            continue
        p = pos[ids]
        c = p - p.mean(0)
        axis = np.linalg.eigh(c.T @ c)[1][:, -1]
        t = c @ axis
        mask_b = t > np.median(t)
        if mask_b.all() or (~mask_b).all():
            mask_b = np.zeros(len(ids), bool)
            mask_b[np.argsort(t, kind="stable")[len(ids) // 2:]] = True
        # Vertex separator: A-side DOFs adjacent to B-side DOFs.
        touch_b = g @ mask_b.astype(np.float32)
        sep_local = (~mask_b) & (touch_b > 0)
        a_local = (~mask_b) & ~sep_local
        nodes.append(dict(depth=depth, cols=ids[sep_local], parent=parent,
                          leaf=False))
        for m in (a_local, mask_b):
            sub = g[m][:, m]
            stack.append((sub, ids[m], depth + 1, nid))
    return nodes


def front_structure(pattern: sp.csr_matrix, nodes):
    """Closed-border fronts: border(nid) = (pattern-neighbors of cols ∪
    children's borders) minus DOFs eliminated at nid or its descendants.
    Closure means every child border id lands INSIDE the parent front, so
    the extend-add is a static gather."""
    n = pattern.shape[0]
    elim_at = np.empty(n, np.int64)
    for nid, nd in enumerate(nodes):
        elim_at[nd["cols"]] = nid
    depths = np.array([nd["depth"] for nd in nodes])
    indptr, indices = pattern.indptr, pattern.indices

    is_anc: List[set] = []
    for nid, nd in enumerate(nodes):
        s = set()
        p = nd["parent"]
        while p != -1:
            s.add(p)
            p = nodes[p]["parent"]
        is_anc.append(s)

    children = {}
    for nid, nd in enumerate(nodes):
        children.setdefault(nd["parent"], []).append(nid)

    borders: List[Optional[np.ndarray]] = [None] * len(nodes)
    maxd = int(depths.max())
    for d in range(maxd, -1, -1):
        for nid in np.nonzero(depths == d)[0]:
            cols = nodes[nid]["cols"]
            chunks = [indices[indptr[c]:indptr[c + 1]] for c in cols]
            for ch in children.get(nid, []):
                chunks.append(borders[ch])
            if chunks:
                nb = np.unique(np.concatenate(chunks))
            else:
                nb = np.empty(0, np.int64)
            anc = is_anc[nid]
            keep = np.fromiter((elim_at[x] in anc for x in nb), bool, len(nb))
            borders[nid] = nb[keep]
    return borders, depths, children


# ---------------------------------------------------------------------------
# The pack: per-depth padded batches + every static index table.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _DepthTables:
    """One elimination-tree depth, padded to a common front shape."""

    epad: int
    bpad: int
    rows: np.ndarray        # (B, Kpad) int32 global DOF per slot; sentinel n
    loc: np.ndarray         # (B, Kpad, W) int16 assembly target col slot;
    #                         Kpad = dump (entry belongs to another front)
    child_idx: np.ndarray   # (B, 2) int32 into the NEXT-DEEPER batch;
    #                         sentinel B_child = zero front
    child_map: np.ndarray   # (B, 2, Kpad) int16 slot -> child border pos;
    #                         sentinel bpad_child = zero row
    pad_elim: np.ndarray    # (B, epad) f32: 1.0 on padding slots

    @property
    def kpad(self) -> int:
        return self.epad + self.bpad


@dataclasses.dataclass
class NDPack:
    """Host pack (cacheable): depth tables ordered DEEPEST FIRST."""

    n: int
    w: int
    levels: List[_DepthTables]
    stats: dict

    def device(self):
        """Upload the per-depth tables once; returns the jit-ready pytree."""
        out = []
        for dt in self.levels:
            out.append(dict(
                rows=jnp.asarray(dt.rows, jnp.int32),
                loc=jnp.asarray(dt.loc.astype(np.int32)),
                child_idx=jnp.asarray(dt.child_idx, jnp.int32),
                child_map=jnp.asarray(dt.child_map.astype(np.int32)),
                pad_elim=jnp.asarray(dt.pad_elim, jnp.float32),
            ))
        return out


def build_nd_pack(ell_cols: np.ndarray, pos: np.ndarray, leaf: int = 64,
                  cache_key: str = "") -> NDPack:
    """Symbolic analysis + index tables for the union-ELL pattern.

    ``pos`` gives a 3D coordinate per DOF (for the inertial bisection);
    any geometry-respecting embedding works — quality only affects fill.
    Disk-cached per pattern via utils/artifacts when ``cache_key`` is set.
    """
    from meshopticalflow_tpu.utils.artifacts import cached

    ell_cols = np.asarray(ell_cols)
    n, w = ell_cols.shape

    def compute():
        rows_h = np.repeat(np.arange(n, dtype=np.int64), w)
        pattern = sp.csr_matrix(
            (np.ones(n * w, np.float32), (rows_h, ell_cols.astype(np.int64).ravel())),
            shape=(n, n))
        pattern.sum_duplicates()
        nodes = nested_dissection(pattern, np.asarray(pos, np.float64), leaf)
        borders, depths, children = front_structure(pattern, nodes)
        maxd = int(depths.max())

        # ELL cols padded with a sentinel row (gathers of padding rows).
        cols_pad = np.concatenate(
            [ell_cols.astype(np.int64), np.full((1, w), n, np.int64)], axis=0)

        out = dict(meta=np.asarray([n, w, maxd], np.int64))
        order_at_depth = {}   # depth -> list of nids in batch order
        for d in range(maxd, -1, -1):
            nids = list(np.nonzero(depths == d)[0])
            order_at_depth[d] = nids
            B = len(nids)
            es = [len(nodes[i]["cols"]) for i in nids]
            bs = [len(borders[i]) for i in nids]
            epad = _pad8(max(es))
            bpad = _pad8(max(bs)) if max(bs) > 0 else 8
            kpad = epad + bpad

            rows = np.full((B, kpad), n, np.int64)
            g2f = np.full(n + 1, -1, np.int64)
            g2loc = np.zeros(n + 1, np.int64)
            for i, nid in enumerate(nids):
                c, b = nodes[nid]["cols"], borders[nid]
                rows[i, :len(c)] = c
                rows[i, epad:epad + len(b)] = b
                g2f[c] = i
                g2loc[c] = np.arange(len(c))
                g2f[b] = i
                g2loc[b] = epad + np.arange(len(b))

            # Assembly targets: entry (row slot k, ELL col c) lands at the
            # front-local slot of c iff c belongs to THIS front, with the
            # border x border couplings excluded (they are assembled at the
            # ancestor that eliminates them).
            C = cols_pad[rows]                        # (B, kpad, w)
            own = g2f[C] == np.arange(B)[:, None, None]
            tgt = np.where(own, g2loc[C], kpad)
            is_elim_row = (np.arange(kpad) < epad)[None, :, None]
            tgt = np.where(own & (is_elim_row | (tgt < epad)), tgt, kpad)

            # Children: strictly at depth d+1 (construction invariant).
            child_idx = np.full((B, 2), -1, np.int64)
            child_map = np.zeros((B, 2, kpad), np.int64)
            if d < maxd:
                prev_nids = order_at_depth[d + 1]
                prev_pos = {nid: i for i, nid in enumerate(prev_nids)}
                bpad_c = _pad8(max(len(borders[i]) for i in prev_nids)) \
                    if max(len(borders[i]) for i in prev_nids) > 0 else 8
                child_idx[:] = len(prev_nids)         # sentinel: zero front
                child_map[:] = bpad_c                 # sentinel: zero row
                for i, nid in enumerate(nids):
                    for ci, ch in enumerate(children.get(nid, [])):
                        assert nodes[ch]["depth"] == d + 1
                        child_idx[i, ci] = prev_pos[ch]
                        bc = borders[ch]
                        idx = np.searchsorted(bc, rows[i])
                        hit = (idx < len(bc))
                        hit[hit] &= bc[idx[hit]] == rows[i][hit]
                        # Closed borders: every child-border id is in the
                        # parent front.
                        assert hit.sum() == len(bc), "open border"
                        child_map[i, ci][hit] = idx[hit]
            else:
                child_idx[:] = 0
                child_map[:] = 0

            pad_elim = (rows[:, :epad] == n).astype(np.float32)
            out[f"d{d:02d}_rows"] = rows.astype(np.int32)
            out[f"d{d:02d}_loc"] = tgt.astype(np.int16)
            out[f"d{d:02d}_cidx"] = child_idx.astype(np.int32)
            out[f"d{d:02d}_cmap"] = child_map.astype(np.int16)
            out[f"d{d:02d}_pad"] = pad_elim
            out[f"d{d:02d}_shape"] = np.asarray([epad, bpad], np.int64)
        return out

    d = cached("ndpack", cache_key, compute, enabled=bool(cache_key))
    n_, w_, maxd = [int(v) for v in d["meta"]]
    levels = []
    padded_flops = 0.0
    padded_mb = 0.0
    for dep in range(maxd, -1, -1):
        epad, bpad = [int(v) for v in d[f"d{dep:02d}_shape"]]
        dt = _DepthTables(
            epad=epad, bpad=bpad,
            rows=np.asarray(d[f"d{dep:02d}_rows"]),
            loc=np.asarray(d[f"d{dep:02d}_loc"]),
            child_idx=np.asarray(d[f"d{dep:02d}_cidx"]),
            child_map=np.asarray(d[f"d{dep:02d}_cmap"]),
            pad_elim=np.asarray(d[f"d{dep:02d}_pad"]),
        )
        levels.append(dt)
        b = dt.rows.shape[0]
        padded_flops += b * (epad ** 3 / 3 + epad ** 2 * bpad + epad * bpad ** 2)
        padded_mb += b * 4 * (epad + bpad) ** 2 / 1e6
    return NDPack(n=n_, w=w_, levels=levels,
                  stats=dict(depths=maxd + 1,
                             padded_gflops=round(padded_flops / 1e9, 2),
                             padded_front_mb=round(padded_mb, 1)))


# ---------------------------------------------------------------------------
# Device numeric factorization + triangular solves.
# ---------------------------------------------------------------------------

def shift_diag(sys_vals, diag_slot, shift_rel):
    """A + shift_rel * diag(A): the factorization safety shift for
    semi-definite systems (open-mesh conformal bases have an exact null
    space; the production Whitney GN systems are PD but near-singular).
    The shifted factor is a preconditioner; iterative refinement restores
    true-residual accuracy — the same contract as the banded c1's shift
    ladder (solvers/pallas_mg.py)."""
    n = sys_vals.shape[0]
    rows = jnp.arange(n)
    d = sys_vals[rows, diag_slot]
    return sys_vals.at[rows, diag_slot].add(shift_rel * d)


def _factor(levels_dev, sys_vals):
    """One batched multifrontal Cholesky sweep (deepest depth -> root).

    ``sys_vals`` is the level system on the union ELL pattern (N, W) f32.
    Returns [(Ld, Lp)] per depth, deepest first. Runs entirely under jit —
    the caller wraps it."""
    n, w = sys_vals.shape
    vals_pad = jnp.concatenate(
        [sys_vals, jnp.zeros((1, w), sys_vals.dtype)], axis=0)
    u_prev = None
    factors = []
    for li, dt in enumerate(levels_dev):
        rows, loc = dt["rows"], dt["loc"]
        B, kpad = rows.shape
        epad = dt["pad_elim"].shape[1]
        rowvals = vals_pad[rows]                       # (B, kpad, w) row gather
        bi = jax.lax.broadcasted_iota(jnp.int32, (B, kpad, w), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (B, kpad, w), 1)
        F = jnp.zeros((B, kpad, kpad + 1), sys_vals.dtype)
        F = F.at[bi, ki, loc].add(rowvals, mode="drop",
                                  unique_indices=False)
        F = F[:, :, :kpad]
        if u_prev is not None:
            bc = u_prev.shape[1]
            u_pad = jnp.concatenate(
                [u_prev, jnp.zeros((1, bc, bc), u_prev.dtype)], axis=0)
            batch = jnp.arange(B)[:, None]
            for c in (0, 1):
                cidx = dt["child_idx"][:, c]
                cmap = dt["child_map"][:, c]           # (B, kpad)
                T = u_pad[cidx]                        # (B, bc, bc)
                T = jnp.concatenate(
                    [T, jnp.zeros((B, 1, bc), T.dtype)], axis=1)
                T2 = T[batch, cmap]                    # (B, kpad, bc)
                T3 = jnp.swapaxes(T2, 1, 2)            # (B, bc, kpad)
                T3 = jnp.concatenate(
                    [T3, jnp.zeros((B, 1, kpad), T.dtype)], axis=1)
                T4 = T3[batch, cmap]                   # (B, kpad, kpad)
                F = F + jnp.swapaxes(T4, 1, 2)
        fe = F[:, :epad, :epad] \
            + jnp.eye(epad, dtype=F.dtype) * dt["pad_elim"][:, None, :]
        ld = jnp.linalg.cholesky(fe)
        bblk = F[:, epad:, :epad]                      # (B, bpad, epad)
        lp = jax.lax.linalg.triangular_solve(
            ld, bblk, left_side=False, lower=True, transpose_a=True)
        u_prev = F[:, epad:, epad:] - lp @ jnp.swapaxes(lp, 1, 2)
        factors.append((ld, lp))
    return factors


def _solve(levels_dev, factors, b):
    """Forward + backward triangular sweeps for one rhs. Under jit."""
    x = jnp.concatenate([b, jnp.zeros((1,), b.dtype)])
    # Forward: L y = b, depth-by-depth from the leaves.
    for dt, (ld, lp) in zip(levels_dev, factors):
        epad = dt["pad_elim"].shape[1]
        re = dt["rows"][:, :epad]
        rb = dt["rows"][:, epad:]
        y = x[re]                                      # (B, epad)
        y = jax.lax.linalg.triangular_solve(
            ld, y[..., None], left_side=True, lower=True)[..., 0]
        x = x.at[re].set(y, mode="drop")
        upd = jnp.einsum("bke,be->bk", lp, y)
        x = x.at[rb].add(-upd, mode="drop")
    # Backward: L^T x = y, root -> leaves.
    for dt, (ld, lp) in zip(reversed(levels_dev), reversed(factors)):
        epad = dt["pad_elim"].shape[1]
        re = dt["rows"][:, :epad]
        rb = dt["rows"][:, epad:]
        z = x[re] - jnp.einsum("bke,bk->be", lp, x[rb])
        z = jax.lax.linalg.triangular_solve(
            ld, z[..., None], left_side=True, lower=True,
            transpose_a=True)[..., 0]
        x = x.at[re].set(z, mode="drop")
    return x[:-1]


@jax.jit
def _factor_jit(levels_dev, sys_vals):
    return _factor(levels_dev, sys_vals)


@jax.jit
def _solve_jit(levels_dev, factors, b):
    return _solve(levels_dev, factors, b)


@jax.jit
def _factor_solve_jit(levels_dev, sys_vals, b):
    """Fused factor+first-solve: one dispatch for the level's cold start."""
    factors = _factor(levels_dev, sys_vals)
    return factors, _solve(levels_dev, factors, b)


class NDSolver:
    """Per-level direct solver: numeric refactorization on a static pack.

    Mirrors the inner-solver contract of solvers/refine.py: ``solve(r, ...)``
    returns (x, CGStats) where ``iterations`` counts triangular solves (the
    refinement observability treats direct rounds as 1-iteration solves).

    ``direct_schedule`` drives the two-fetch fixed refinement
    (refine.refine_fixed_pipelined): three 1-solve rounds reach 1e-10..1e-12
    relative residual on the production f32 systems (measured on chip,
    bench_runs/round4_exp_mf_2026-08-19.jsonl) — comfortably under the
    pipeline's 3e-9 tolerance, with the factorization fused into the first
    round's dispatch.
    """

    direct_schedule = (1, 1, 1)

    def __init__(self, pack: NDPack, levels_dev, sys_vals,
                 diag_slot=None, shift_rel: float = 0.0):
        self.pack = pack
        self.levels_dev = levels_dev
        # dtype-preserving: the production path passes f32; f64 oracle
        # tests and CPU runs keep full precision.
        if shift_rel and diag_slot is not None:
            sys_vals = shift_diag(sys_vals, diag_slot,
                                  jnp.asarray(shift_rel, sys_vals.dtype))
        self.sys_vals = sys_vals
        self.factors = None
        # Streamed-bytes model for the effective-bandwidth level metric:
        # one factorization streams every padded front once.
        self.gb_per_iter = pack.stats["padded_front_mb"] / 1e3

    def factor(self):
        self.factors = _factor_jit(self.levels_dev, self.sys_vals)

    def solve_direct(self, r):
        """One direct solve (factors on first use; fused with the solve)."""
        if self.factors is None:
            self.factors, x = _factor_solve_jit(self.levels_dev,
                                                self.sys_vals, r)
            return x
        return _solve_jit(self.levels_dev, self.factors, r)

    def solve_fixed(self, r, iters):
        """Fixed-round inner solve for refine_fixed_pipelined: a direct
        solve ignores the iteration budget (one triangular sweep pair)."""
        del iters
        return self.solve_direct(r.astype(self.sys_vals.dtype)).astype(r.dtype)

    def solve(self, r, tol=None, max_iters=None, b_norm2=None, x0=None):
        from meshopticalflow_tpu.solvers.cg import CGStats
        x = self.solve_direct(r.astype(self.sys_vals.dtype)).astype(r.dtype)
        return x, CGStats(jnp.asarray(1, jnp.int32),
                          jnp.asarray(0.0, r.dtype))


@dataclasses.dataclass
class NDContext:
    """Per-problem multifrontal state for the flow pipeline: the symbolic
    pack (host, disk-cached) and its device tables, built once — every level
    refactorizes numerically on the same static structure (the reference's
    amortized symbolic analysis, LinearSolvers.h:294-299)."""

    pack: NDPack
    levels_dev: list
    diag_slot: object = None


def build_nd_context(tris, verts, p_idx, ell_cols, n_coeffs: int,
                     diag_slot=None, leaf: int = 64,
                     cache_key: str = "") -> NDContext:
    """Symbolic analysis + device upload for one problem's flow pattern."""
    pos = dof_positions(np.asarray(tris), np.asarray(verts),
                        np.asarray(p_idx), n_coeffs)
    pack = build_nd_pack(np.asarray(ell_cols), pos, leaf=leaf,
                         cache_key=cache_key)
    return NDContext(pack=pack, levels_dev=pack.device(), diag_slot=diag_slot)
