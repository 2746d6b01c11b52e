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

    tile_cols: (nr, K) int32        column tile per block row (padded slots
                                    repeat tile 0 with zero values)
    vals_t:    (nr, K, 128, 128)    TRANSPOSED tiles so the kernel contracts
                                    a row-vector x-slice on the MXU:
                                        y[1,128] += x[1,128] @ vals_t[r,k]

x lives fully in VMEM as (col_nr, 128) — one sublane row per column tile —
so fetching a column tile is a dynamic sublane slice, not a gather (the op
Mosaic lacks). tile_cols rides in SMEM via PrefetchScalarGridSpec.

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
    array into the flat TRANSPOSED tile array, so device-side revaluation is
    one scatter-add (`revalue`). Permutations are baked in: row i of the
    original operator lives at permuted position inv_row_perm[i].
    """

    tile_cols: np.ndarray      # (nr, K) int32
    slots: np.ndarray          # (n * W,) int64 into vals_t.ravel()
    row_perm: np.ndarray       # (row_n,) permuted slot -> original index
    col_perm: np.ndarray
    row_n: int
    col_n: int

    @property
    def nr(self) -> int:
        return self.tile_cols.shape[0]

    @property
    def k(self) -> int:
        return self.tile_cols.shape[1]

    @property
    def col_nr(self) -> int:
        return -(-self.col_n // 128)


def pack_pattern(ell_cols: np.ndarray, row_perm: np.ndarray,
                 col_perm: Optional[np.ndarray] = None,
                 col_n: Optional[int] = None,
                 rows_per_step: int = 2) -> BlockEllPattern:
    """Pack a padded-ELL pattern (n, W) into 128x128 block-ELL tile form.

    Padded ELL slots (column == row's padding target, value 0) simply map to
    whatever tile holds that (row, col) position — scatter-adding zero.
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
    # tiles per block row, padded to the max (block-ELL)
    per_row = np.bincount((blocks // ncr).astype(np.int64), minlength=nr)
    k = max(int(per_row.max()), 1)
    row_start = np.zeros(nr + 1, np.int64)
    np.cumsum(per_row, out=row_start[1:])
    tile_slot_of_block = np.arange(len(blocks)) - row_start[blocks // ncr]
    tile_cols = np.zeros((nr, k), np.int32)
    tile_cols[blocks // ncr, tile_slot_of_block] = blocks % ncr
    pad_mask = np.arange(k)[None, :] >= per_row[:, None]
    fill = np.where(per_row > 0, tile_cols[:, 0], 0)
    tile_cols = np.where(pad_mask, fill[:, None], tile_cols)

    block_of_entry = np.searchsorted(blocks, key)
    kslot = tile_slot_of_block[block_of_entry]
    # transposed tile layout: vals_t[block_row, kslot, pj%128, pi%128]
    slots = (((bi * k + kslot) * 128 + (pj % 128)) * 128 + (pi % 128))
    return BlockEllPattern(tile_cols=tile_cols, slots=slots.astype(np.int64),
                           row_perm=np.asarray(row_perm), col_perm=np.asarray(col_perm),
                           row_n=len(row_perm), col_n=col_n)


class PallasEll:
    """Device block-ELL operator over a BlockEllPattern.

    ``apply(x_tiles)`` works in PERMUTED TILE SPACE: x_tiles is
    (col_nr, 128) f32, returns (nr, 128). Use ``to_tiles``/``from_tiles``
    at solver boundaries only.
    """

    def __init__(self, pattern: BlockEllPattern, tile_cols_dev, vals_t,
                 rows_per_step: int = 2, interpret: bool = False):
        self.pattern = pattern
        self.tile_cols = tile_cols_dev
        self.vals_t = vals_t
        self.rows_per_step = rows_per_step
        self.interpret = interpret

    @classmethod
    def from_ell_values(cls, pattern: BlockEllPattern, slots_dev, ell_vals,
                        dtype=jnp.float32, rows_per_step: int = 2,
                        interpret: bool = False) -> "PallasEll":
        """Revalue the packed operator from a padded-ELL values array
        ((n, W), matching the cols the pattern was packed from) — one
        device scatter-add. ``slots_dev`` = jnp.asarray(pattern.slots)."""
        nr, k = pattern.tile_cols.shape
        vals_t = _revalue(slots_dev, ell_vals, nr, k, dtype)
        return cls(pattern, jnp.asarray(pattern.tile_cols), vals_t,
                   rows_per_step, interpret)

    def apply(self, x_tiles):
        return spmv_tiles(self.tile_cols, x_tiles, self.vals_t,
                          rows_per_step=self.rows_per_step,
                          interpret=self.interpret)

    @property
    def gigabytes(self) -> float:
        return self.vals_t.size * self.vals_t.dtype.itemsize / 1e9


@functools.partial(jax.jit, static_argnames=("nr", "k", "dtype"))
def _revalue(slots, ell_vals, nr: int, k: int, dtype):
    flat = jnp.zeros((nr * k * 128 * 128,), jnp.float32)
    flat = flat.at[slots].add(ell_vals.ravel().astype(jnp.float32))
    return flat.reshape(nr, k, 128, 128).astype(dtype)


@functools.partial(jax.jit, static_argnames=("nr", "k"))
def _revalue_pair(slots, ell_vals, nr: int, k: int):
    """One scatter producing both the f32 and bf16 tile arrays (fusing the
    cast saves a full extra pass over the tiles per level)."""
    flat = jnp.zeros((nr * k * 128 * 128,), jnp.float32)
    flat = flat.at[slots].add(ell_vals.ravel().astype(jnp.float32))
    v = flat.reshape(nr, k, 128, 128)
    return v, v.astype(jnp.bfloat16)


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


def to_tiles_multi(v, perm, nr: int):
    """(n, C<=8) -> (nr, 8, 128) channel-sublane tile layout."""
    n, c = v.shape
    vp = jnp.zeros((nr * 128, 8), v.dtype).at[:n, :c].set(v[perm])
    return vp.reshape(nr, 128, 8).transpose(0, 2, 1)


def from_tiles_multi(vt, inv_perm, n: int, c: int):
    """(nr, 8, 128) -> (n, C)."""
    flat = vt.transpose(0, 2, 1).reshape(-1, 8)[:n, :c]
    return flat[inv_perm]


# -- tile-space vector helpers -------------------------------------------

def to_tiles(v, perm, nr: int):
    """(n,) original-order vector -> (nr, 128) permuted tile layout."""
    n = perm.shape[0]
    vp = jnp.zeros((nr * 128,), v.dtype).at[:n].set(v[perm])
    return vp.reshape(nr, 128)


def from_tiles(vt, inv_perm, n: int):
    """(nr, 128) tile layout -> (n,) original order."""
    return vt.reshape(-1)[:n][inv_perm]
