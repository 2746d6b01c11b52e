"""Pallas block-ELL SpMV — the TPU-native sparse matvec (VERDICT r1 item 2).

Replaces the XLA gather+einsum block-ELL path of ops/bsr.py in the CG/MG hot
loop. Match target: the reference's OpenMP CSR SpMV
(/root/reference/include/Misha/SparseMatrixInterface.inl:97-134).

Measured reality on this chip (scripts/bench_spmv.py):
  * the kernel itself streams tiles at 310-440 GB/s; the XLA einsum path's
    extra cost was the x[perm] / y[inv_perm] gathers (~5 ms each at N=325k),
    so SOLVERS KEEP THEIR STATE IN THE PERMUTED TILE LAYOUT and only pay the
    permutation once per solve (see solvers/pallas_mg.py);
  * bfloat16 tiles halve the stream (4.3 ms vs 6.1 ms on the 2.66/1.33 GB
    demo flow operator) and cost ZERO extra PCG iterations when used for
    preconditioner-side matvecs (CPU bf16-emulation: 135 vs 134 iters);
  * per-grid-step floor ~1.6 us: steps carry rows_per_step block rows.

Layout (host pack from the RCM-permuted pattern, 128x128 tiles):

    tile_cols: per-bucket (nr_b, K_b) int32   column tile per block row
                                    (padded slots repeat tile 0 with zero
                                    values)
    vals_t:    per-bucket (nr_b, K_b, 128, 128)  TRANSPOSED tiles so the
                                    kernel contracts a row-vector x-slice
                                    on the MXU:
                                        y[1,128] += x[1,128] @ vals_t[r,k]

x lives fully in VMEM as (col_nr, 128) — one sublane row per column tile —
so fetching a column tile is a dynamic sublane slice, not a gather (the op
Mosaic lacks). tile_cols rides in SMEM via PrefetchScalarGridSpec.

Block-ELL pads every block row to the SAME tile count K; on the real flow
operators the mean count is ~half of K (8.3 vs 16 at 2K-bench scale), so a
single-K stream wastes ~45% of its HBM bytes on zero tiles. The pack
therefore sorts block rows by their real tile count and splits them into a
few BUCKETS, each padded only to its own K (one pallas_call per bucket;
rows return to tile order with one cheap (nr,128) row gather). Per-row
accumulation order is unchanged, so results are bit-identical to the
single-bucket kernel. Measured pattern savings at 2K-bench scale with 3
buckets: fine 42%, P0 40%, c1 21%, P0^T 24% of streamed tiles.

Rectangular operators (the multigrid transfer matrices P0 / P0^T) use the
same kernel with independent row/column permutations.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def resolve_flow_backend(backend: str, dtype) -> str:
    """Resolve the flow/smooth backend for a working dtype.

    "auto" picks pallas on TPU, xla elsewhere. float64 NEVER resolves to
    pallas: Mosaic has no f64 lowering ('failed to legalize operation
    func.func', measured 2026-08-20 on the axon TPU), while plain XLA:TPU
    executes f64 natively at ~2.2x the f32 matmul cost
    (bench_runs/round5_exp_f64_2026-08-20.jsonl) — so f64 device runs take
    the gather+einsum XLA path end-to-end, matching the reference's
    double-precision default (OpticalFlow.cpp:1113-1115) on chip."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas" and jnp.dtype(dtype) == jnp.float64:
        backend = "xla"
    return backend


def _spmv_kernel(tc_ref, x_ref, vals_ref, o_ref, *, k: int, r: int):
    """R block rows: y[row] = sum_k x_slice(1,128) @ vals_t[row, k]."""
    i = pl.program_id(0)
    for rr in range(r):
        row = i * r + rr
        acc = jnp.zeros((1, 128), jnp.float32)
        for kk in range(k):
            xs = x_ref[pl.ds(tc_ref[row * k + kk], 1), :]   # (1, 128) f32
            # bf16 tiles upconvert on the VPU before the dot (Mosaic rejects
            # a 1-row bf16 lhs); the HBM stream — the real cost — stays bf16.
            acc = acc + jnp.dot(xs, vals_ref[rr, kk].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(row % 8, 1), :] = acc


@functools.partial(jax.jit, static_argnames=("rows_per_step", "interpret"))
def spmv_tiles(tile_cols, x_tiles, vals_t, rows_per_step: int = 2,
               interpret: bool = False):
    """y_tiles (nr, 128) = A @ x for tile-layout operands (permuted space).

    ``x_tiles`` is (col_nr, 128) float32; rows beyond the true dimension are
    zero and stay zero in the output (padded tiles hold zero values).
    """
    nr, k, bc, br = vals_t.shape
    r = rows_per_step
    assert nr % r == 0 and 8 % r == 0, (nr, r)
    nr8 = -(-nr // 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr // r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # x: fully resident
            pl.BlockSpec((r, k, bc, br), lambda i, tc: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # vals: streamed
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, tc: ((i * r) // 8, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_spmv_kernel, k=k, r=r),
        out_shape=jax.ShapeDtypeStruct((nr8, 8, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_cols.reshape(-1), x_tiles, vals_t)
    return out.reshape(nr8 * 8, 128)[:nr]


@dataclasses.dataclass(frozen=True)
class BlockEllPattern:
    """Host-side 128x128 block-ELL pattern of a (row_n x col_n) operator.

    ``slots`` maps each entry of a padded-ELL (row-major (n, W)) values
    array into the concatenation of the per-bucket flat TRANSPOSED tile
    arrays, so device-side revaluation is one scatter-add (`_revalue`).
    Permutations are baked in: row i of the original operator lives at
    permuted position inv_row_perm[i].

    Block rows are processed in ``row_sort`` order (sorted by real tile
    count, partitioned into buckets each padded to its own K);
    ``row_unsort`` restores tile order on the kernel output. With one
    bucket both are identity and the restore gather is skipped.
    """

    tile_cols: tuple           # per bucket: (nr_b, K_b) int32, rows sorted
    slots: np.ndarray          # (n * W,) int64 into concat(vals_t_b.ravel())
    row_perm: np.ndarray       # (row_n,) permuted slot -> original index
    col_perm: np.ndarray
    row_n: int
    col_n: int
    row_sort: np.ndarray       # (nr,) sorted slot -> tile block row
    row_unsort: np.ndarray     # (nr,) tile block row -> sorted slot

    @property
    def nr(self) -> int:
        return self.row_sort.shape[0]

    @property
    def k(self) -> int:
        return max(tc.shape[1] for tc in self.tile_cols)

    @property
    def bucket_sizes(self) -> tuple:
        """Static ((nr_b, K_b), ...) for jit keys / revalue shapes."""
        return tuple((tc.shape[0], tc.shape[1]) for tc in self.tile_cols)

    @property
    def trivial_sort(self) -> bool:
        return len(self.tile_cols) == 1

    @property
    def col_nr(self) -> int:
        return -(-self.col_n // 128)


def _bucket_split(per_row: np.ndarray, k: int, buckets: int):
    """Optimal partition of K-sorted block rows into <= ``buckets`` groups.

    Boundaries are multiples of 8 (whole output tiles / grid alignment).
    Returns (starts, ks): bucket b covers sorted rows
    [starts[b], starts[b+1]) padded to ks[b] tiles. DP minimizes the total
    streamed tile count sum_b count_b * ks[b]; adjacent buckets whose merge
    costs < 1% extra are merged (fewer kernel dispatches).
    """
    nr = len(per_row)
    sg = np.sort(per_row)
    cands = list(range(0, nr + 1, 8))
    inf = float("inf")
    cost = {(0, 0): 0.0}
    back = {}
    for b in range(1, buckets + 1):
        for j in cands:
            best, arg = cost.get((b - 1, j), inf), (b - 1, j)
            for i in cands:
                if i >= j:
                    break
                prev = cost.get((b - 1, i), inf)
                if prev < inf:
                    c = prev + (j - i) * max(int(sg[j - 1]), 1)
                    if c < best:
                        best, arg = c, (b - 1, i)
            cost[(b, j)] = best
            back[(b, j)] = arg
    # walk back from the cheapest (b, nr)
    b = min(range(1, buckets + 1), key=lambda bb: cost.get((bb, nr), inf))
    bounds = [nr]
    key = (b, nr)
    while key[1] > 0:
        key = back[key]
        if key[1] != bounds[-1]:     # skip zero-width (unused) buckets
            bounds.append(key[1])
    if bounds[-1] != 0:
        bounds.append(0)
    bounds = bounds[::-1]
    starts = bounds[:-1]
    ks = [max(int(sg[e - 1]), 1) for e in bounds[1:]]
    # merge near-equal buckets
    total = sum((e - s) * kk for s, e, kk in zip(bounds, bounds[1:], ks))
    merged_s, merged_k = [starts[0]], [ks[0]]
    for s, e, kk in zip(starts[1:], bounds[2:], ks[1:]):
        extra = (s - merged_s[-1]) * (kk - merged_k[-1])
        if extra <= 0.01 * total:
            merged_k[-1] = kk
        else:
            merged_s.append(s)
            merged_k.append(kk)
    return merged_s + [nr], merged_k


def pack_pattern(ell_cols: np.ndarray, row_perm: np.ndarray,
                 col_perm: Optional[np.ndarray] = None,
                 col_n: Optional[int] = None,
                 rows_per_step: int = 2,
                 buckets: int = 3) -> BlockEllPattern:
    """Pack a padded-ELL pattern (n, W) into 128x128 block-ELL tile form.

    Padded ELL slots (column == row's padding target, value 0) simply map to
    whatever tile holds that (row, col) position — scatter-adding zero.
    ``buckets`` > 1 sorts block rows by real tile count and pads each bucket
    only to its own K (see module docstring).
    """
    n, w = ell_cols.shape
    row_perm = np.asarray(row_perm, np.int64)
    col_perm = row_perm if col_perm is None else np.asarray(col_perm, np.int64)
    col_n = n if col_n is None else col_n
    inv_r = np.empty(len(row_perm), np.int64)
    inv_r[row_perm] = np.arange(len(row_perm))
    inv_c = np.empty(len(col_perm), np.int64)
    inv_c[col_perm] = np.arange(len(col_perm))

    rows = np.repeat(np.arange(n, dtype=np.int64), w)
    cols = np.asarray(ell_cols, np.int64).ravel()
    pi, pj = inv_r[rows], inv_c[cols]
    nr = -(-len(row_perm) // 128)
    # Round block-row count up so the grid divides rows_per_step (also 8 for
    # the packed output tiles).
    lcm = max(rows_per_step, 8)
    nr = -(-nr // lcm) * lcm
    ncr = -(-col_n // 128)
    bi, bj = pi // 128, pj // 128
    key = bi * ncr + bj
    blocks = np.unique(key)
    # tiles per block row, padded per bucket (block-ELL)
    per_row = np.bincount((blocks // ncr).astype(np.int64), minlength=nr)
    k = max(int(per_row.max()), 1)
    row_start = np.zeros(nr + 1, np.int64)
    np.cumsum(per_row, out=row_start[1:])
    tile_slot_of_block = np.arange(len(blocks)) - row_start[blocks // ncr]
    tile_cols_full = np.zeros((nr, k), np.int32)
    tile_cols_full[blocks // ncr, tile_slot_of_block] = blocks % ncr
    pad_mask = np.arange(k)[None, :] >= per_row[:, None]
    fill = np.where(per_row > 0, tile_cols_full[:, 0], 0)
    tile_cols_full = np.where(pad_mask, fill[:, None], tile_cols_full)

    if buckets <= 1:
        row_sort = np.arange(nr, dtype=np.int64)
        starts, ks = [0, nr], [k]
    else:
        row_sort = np.argsort(per_row, kind="stable").astype(np.int64)
        starts, ks = _bucket_split(per_row, k, buckets)
        if len(ks) == 1:
            # Single bucket: sorting buys nothing — keep identity order so
            # the restore gather is skipped (trivial_sort).
            row_sort = np.arange(nr, dtype=np.int64)
            ks = [k]
    row_unsort = np.empty(nr, np.int64)
    row_unsort[row_sort] = np.arange(nr)

    tile_cols = tuple(
        np.ascontiguousarray(tile_cols_full[row_sort[s:e], :kk])
        for s, e, kk in zip(starts, starts[1:], ks))

    block_of_entry = np.searchsorted(blocks, key)
    kslot = tile_slot_of_block[block_of_entry]
    # transposed tile layout within a bucket:
    #   vals_t_b[local_row, kslot, pj%128, pi%128]
    starts_a = np.asarray(starts[:-1], np.int64)
    ks_a = np.asarray(ks, np.int64)
    counts = np.asarray(starts[1:], np.int64) - starts_a
    offs = np.zeros(len(ks), np.int64)
    np.cumsum(counts[:-1] * ks_a[:-1] * 128 * 128, out=offs[1:])
    sslot = row_unsort[bi]                      # sorted position per entry
    bucket = np.searchsorted(starts_a, sslot, side="right") - 1
    local = sslot - starts_a[bucket]
    slots = (offs[bucket]
             + ((local * ks_a[bucket] + kslot) * 128 + (pj % 128)) * 128
             + (pi % 128))
    return BlockEllPattern(tile_cols=tile_cols, slots=slots.astype(np.int64),
                           row_perm=np.asarray(row_perm), col_perm=np.asarray(col_perm),
                           row_n=len(row_perm), col_n=col_n,
                           row_sort=row_sort, row_unsort=row_unsort)


class PallasEll:
    """Device block-ELL operator over a BlockEllPattern.

    ``apply(x_tiles)`` works in PERMUTED TILE SPACE: x_tiles is
    (col_nr, 128) f32, returns (nr, 128). Use ``to_tiles``/``from_tiles``
    at solver boundaries only. ``tile_cols`` / ``vals_t`` are per-bucket
    tuples (see module docstring); one pallas_call runs per bucket and a
    row gather restores tile order.
    """

    def __init__(self, pattern: BlockEllPattern, tile_cols_dev, vals_t,
                 rows_per_step: int = 2, interpret: bool = False):
        self.pattern = pattern
        self.tile_cols = tile_cols_dev     # tuple of (nr_b, K_b) int32
        self.vals_t = vals_t               # tuple of (nr_b, K_b, 128, 128)
        self.rows_per_step = rows_per_step
        self.interpret = interpret

    @classmethod
    def from_ell_values(cls, pattern: BlockEllPattern, slots_dev, ell_vals,
                        dtype=jnp.float32, rows_per_step: int = 2,
                        interpret: bool = False) -> "PallasEll":
        """Revalue the packed operator from a padded-ELL values array
        ((n, W), matching the cols the pattern was packed from) — one
        device scatter-add. ``slots_dev`` = jnp.asarray(pattern.slots)."""
        vals_t = _revalue(slots_dev, ell_vals, pattern.bucket_sizes, dtype)
        return cls(pattern, tile_cols_dev(pattern), vals_t,
                   rows_per_step, interpret)

    def _restore(self, y_parts):
        if self.pattern.trivial_sort:
            return y_parts[0]
        y = jnp.concatenate(y_parts, axis=0)
        # (nr,) gather restoring tile order — 10 KB of indices, ~1 MB of y.
        return jnp.take(y, jnp.asarray(self.pattern.row_unsort, jnp.int32),
                        axis=0)

    def apply(self, x_tiles):
        return self._restore([
            spmv_tiles(tc, x_tiles, v, rows_per_step=self.rows_per_step,
                       interpret=self.interpret)
            for tc, v in zip(self.tile_cols, self.vals_t)])

    def apply_multi(self, x_tiles):
        """Multi-rhs matvec: x_tiles (col_nr, 8, 128) -> (nr, 8, 128)."""
        return self._restore([
            spmv_tiles_multi(tc, x_tiles, v, interpret=self.interpret)
            for tc, v in zip(self.tile_cols, self.vals_t)])

    @property
    def gigabytes(self) -> float:
        return sum(v.size * v.dtype.itemsize for v in self.vals_t) / 1e9


def tile_cols_dev(pattern: BlockEllPattern) -> tuple:
    """Per-bucket device tile_cols tuple for a pattern."""
    return tuple(jnp.asarray(tc) for tc in pattern.tile_cols)


def _bucketize(flat, sizes, dtype):
    out, off = [], 0
    for nr_b, k_b in sizes:
        sz = nr_b * k_b * 128 * 128
        out.append(flat[off:off + sz].reshape(nr_b, k_b, 128, 128)
                   .astype(dtype))
        off += sz
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("sizes", "dtype"))
def _revalue(slots, ell_vals, sizes: tuple, dtype):
    total = sum(nr_b * k_b for nr_b, k_b in sizes) * 128 * 128
    flat = jnp.zeros((total,), jnp.float32)
    flat = flat.at[slots].add(ell_vals.ravel().astype(jnp.float32))
    return _bucketize(flat, sizes, dtype)


@functools.partial(jax.jit, static_argnames=("sizes",))
def _revalue_pair(slots, ell_vals, sizes: tuple):
    """One scatter producing both the f32 and bf16 tile arrays (fusing the
    cast saves a full extra pass over the tiles per level)."""
    total = sum(nr_b * k_b for nr_b, k_b in sizes) * 128 * 128
    flat = jnp.zeros((total,), jnp.float32)
    flat = flat.at[slots].add(ell_vals.ravel().astype(jnp.float32))
    return (_bucketize(flat, sizes, jnp.float32),
            _bucketize(flat, sizes, jnp.bfloat16))


def _spmv_multi_kernel(tc_ref, x_ref, vals_ref, o_ref, *, k: int):
    """One block row, C<=8 right-hand sides: y(8,128) = sum_k xs(8,128) @ vals_t."""
    i = pl.program_id(0)
    acc = jnp.zeros((8, 128), jnp.float32)
    for kk in range(k):
        xs = x_ref[pl.ds(tc_ref[i * k + kk], 1)][0]        # (8, 128) f32
        acc = acc + jnp.dot(xs, vals_ref[0, kk].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv_tiles_multi(tile_cols, x_tiles, vals_t, interpret: bool = False):
    """Multi-rhs matvec: x_tiles (col_nr, 8, 128) -> (nr, 8, 128).

    Channel c of rhs vector x lives at x_tiles[:, c, :] in the row-permuted
    tile layout (8 channels; pad unused channels with zeros).
    """
    nr, k, bc, br = vals_t.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, bc, br), lambda i, tc: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, tc: (i, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_spmv_multi_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((nr, 8, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_cols.reshape(-1), x_tiles, vals_t)


@functools.partial(jax.jit, static_argnames=("nr",))
def to_tiles_multi(v, perm, nr: int):
    """(n, C<=8) -> (nr, 8, 128) channel-sublane tile layout."""
    n, c = v.shape
    vp = jnp.zeros((nr * 128, 8), v.dtype).at[:n, :c].set(v[perm])
    return vp.reshape(nr, 128, 8).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("n", "c"))
def from_tiles_multi(vt, inv_perm, n: int, c: int):
    """(nr, 8, 128) -> (n, C)."""
    flat = vt.transpose(0, 2, 1).reshape(-1, 8)[:n, :c]
    return flat[inv_perm]


# -- tile-space vector helpers -------------------------------------------

@functools.partial(jax.jit, static_argnames=("nr",))
def to_tiles(v, perm, nr: int):
    """(n,) original-order vector -> (nr, 128) permuted tile layout."""
    n = perm.shape[0]
    vp = jnp.zeros((nr * 128,), v.dtype).at[:n].set(v[perm])
    return vp.reshape(nr, 128)


@functools.partial(jax.jit, static_argnames=("n",))
def from_tiles(vt, inv_perm, n: int):
    """(nr, 128) tile layout -> (n,) original order."""
    return vt.reshape(-1)[:n][inv_perm]


@functools.partial(jax.jit, static_argnames=("nr",))
def inv_diag_tiles(diag, perm, nr: int):
    """Guarded 1/diag in f32 tile layout — the Jacobi smoother operand, as
    ONE dispatch (the eager where/divide/cast/tile chain was ~6)."""
    inv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    n = perm.shape[0]
    vp = jnp.zeros((nr * 128,), jnp.float32).at[:n].set(
        inv.astype(jnp.float32)[perm])
    return vp.reshape(nr, 128)
