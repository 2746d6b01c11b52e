"""Block-ELL (BSR-style) sparse operators for TPU.

The padded-ELL matvec in ops/ell.py is gather-bound on TPU: XLA lowers the
``x[cols]`` fetch to a scalar-ish dynamic gather that runs orders of
magnitude below HBM speed (measured 44 ms at N=325k, W=19 on v5e, ~0.6 GB/s
effective). This module trades memory for bandwidth: after an RCM reordering
concentrates the pattern near the diagonal, the matrix is stored as dense
(Br, Bc) tiles, a fixed K column-tiles per block row (block-ELL). The matvec
is then

    y_tile[r] = sum_k vals[r, k] @ x_tile[tile_cols[r, k]]

— a contiguous row-tile gather (each fetched row is Bc*c*4 bytes, which XLA
moves at near-memcpy speed) followed by a batched matmul on the MXU. No
scalar gathers anywhere.

This mirrors what the reference gets from Eigen/MKL's cache-blocked sparse
kernels (include/Misha/LinearSolvers.h:243-257) but shaped for the TPU
memory system. Zero-padding tiles waste ~2x memory at Br=Bc=128 on the
demo operator (Kmean 8.3 vs Kmax 16); rectangular tiles (Br=8..32, Bc=128)
cut the waste since fewer rows share a column-tile footprint.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HostBlockEll:
    """Host-side block-ELL matrix (already permuted into RCM order).

    Attributes:
      tile_cols: (R, K) int32 — column-tile index per block row (padded
        entries repeat a valid tile and carry zero values).
      vals: (R, K, Br, Bc) float — dense tile values.
      perm: (N,) int — original index -> permuted position is ``inv_perm``;
        ``perm[i]`` is the original index stored at permuted slot i.
      n: original (unpadded) dimension.
      slot_of_nnz: optional (nnz,) int64 — flat index into ``vals`` for each
        entry of the source CSR's ``.data`` (canonical ordering), enabling
        cheap revaluation when the pattern is static but values change.
    """

    tile_cols: np.ndarray
    vals: np.ndarray
    perm: np.ndarray
    n: int
    slot_of_nnz: Optional[np.ndarray] = None

    @property
    def block_shape(self) -> Tuple[int, int]:
        return self.vals.shape[2], self.vals.shape[3]


def rcm_permutation(a: sp.spmatrix) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of a symmetric sparse pattern."""
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(a.tocsr(), symmetric_mode=True))


def block_ell_from_scipy(a: sp.spmatrix, br: int = 8, bc: int = 128,
                         perm: Optional[np.ndarray] = None,
                         dtype=np.float32,
                         with_slot_map: bool = False) -> HostBlockEll:
    """Pack a scipy sparse matrix into block-ELL after (optional) RCM.

    When ``with_slot_map`` is set, ``slot_of_nnz`` maps each stored value of
    the canonicalized CSR (``a.tocsr()`` with sorted indices, zeros kept) to
    its flat position in ``vals`` so updated values can be scattered in
    without repacking the structure.
    """
    a = a.tocsr()
    a.sort_indices()
    if a.shape[0] != a.shape[1]:
        raise ValueError(f"block_ell_from_scipy needs a square operator, got {a.shape}")
    n = a.shape[0]
    if perm is None:
        perm = rcm_permutation(a)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    coo = a.tocoo()
    pi = inv[coo.row]
    pj = inv[coo.col]
    nr = -(-n // br)
    nc = -(-n // bc)

    bi = pi // br
    bj = pj // bc
    tile_key = bi.astype(np.int64) * nc + bj
    order = np.argsort(tile_key, kind="stable")
    tiles, starts = np.unique(tile_key[order], return_index=True)
    tile_of_entry = np.searchsorted(tiles, tile_key)

    per_row = np.bincount((tiles // nc).astype(np.int64), minlength=nr)
    k = int(per_row.max()) if len(tiles) else 1
    # Slot of each tile within its block row.
    row_start = np.zeros(nr + 1, dtype=np.int64)
    np.cumsum(per_row, out=row_start[1:])
    tile_slot = np.arange(len(tiles)) - row_start[tiles // nc]

    tile_cols = np.zeros((nr, k), dtype=np.int32)
    tile_cols[tiles // nc, tile_slot] = tiles % nc
    # Padded slots point at the block row's first tile (value 0).
    pad_mask = np.arange(k)[None, :] >= per_row[:, None]
    fill = np.where(per_row > 0, tile_cols[:, 0], 0)
    tile_cols = np.where(pad_mask, fill[:, None], tile_cols)

    vals = np.zeros((nr, k, br, bc), dtype=dtype)
    flat = ((tiles[tile_of_entry] // nc) * k + tile_slot[tile_of_entry]) \
        * (br * bc) + (pi % br) * bc + (pj % bc)
    np.add.at(vals.reshape(-1), flat, coo.data.astype(dtype))

    slot_map = None
    if with_slot_map:
        # coo of a canonical CSR enumerates entries in .data order already.
        slot_map = flat.astype(np.int64)
    return HostBlockEll(tile_cols=tile_cols, vals=vals,
                        perm=np.asarray(perm), n=n, slot_of_nnz=slot_map)


def entry_slots(h: HostBlockEll, rows: np.ndarray,
                cols: np.ndarray) -> np.ndarray:
    """Flat indices into ``h.vals`` for arbitrary (row, col) pattern entries.

    Enables revaluing a packed operator from values laid out some other way
    (e.g. a padded-ELL (N, W) array: scatter-add ``vals.ravel()`` at
    ``entry_slots(h, repeat(arange(N), W), ell_cols.ravel())``). Every
    queried entry must lie inside the packed pattern.
    """
    br, bc = h.block_shape
    k = h.tile_cols.shape[1]
    inv = np.empty(h.n, dtype=np.int64)
    inv[h.perm] = np.arange(h.n)
    pi, pj = inv[rows], inv[cols]
    r, tc = pi // br, pj // bc
    match = h.tile_cols[r] == tc[:, None]
    kk = np.argmax(match, axis=1)
    if not match[np.arange(len(pi)), kk].all():
        raise ValueError("entry outside the packed sparsity pattern")
    return (r * k + kk) * (br * bc) + (pi % br) * bc + (pj % bc)


@jax.tree_util.register_pytree_node_class
class BlockEllDevice:
    """Device-resident block-ELL operator.

    Use ``matvec(x)`` with x in ORIGINAL index order; permutation in/out is
    part of the operator (two contiguous row gathers, negligible cost).
    """

    def __init__(self, tile_cols, vals, perm, inv_perm, n):
        self.tile_cols = tile_cols
        self.vals = vals
        self.perm = perm
        self.inv_perm = inv_perm
        self.n = int(n)

    @classmethod
    def from_host(cls, h: HostBlockEll, dtype=jnp.float32) -> "BlockEllDevice":
        inv = np.empty(h.n, dtype=np.int64)
        inv[h.perm] = np.arange(h.n)
        return cls(jnp.asarray(h.tile_cols, jnp.int32),
                   jnp.asarray(h.vals, dtype),
                   jnp.asarray(h.perm, jnp.int32),
                   jnp.asarray(inv, jnp.int32), h.n)

    def tree_flatten(self):
        return (self.tile_cols, self.vals, self.perm, self.inv_perm), (self.n,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux[0])

    def matvec(self, x):
        return block_ell_matvec(self.tile_cols, self.vals, self.perm,
                                self.inv_perm, self.n, x)


@functools.partial(jax.jit, static_argnames=("n",))
def block_ell_matvec(tile_cols, vals, perm, inv_perm, n: int, x):
    """y = A @ x for block-ELL A; x is (n,) or (n, c) in original order."""
    nr, k, br, bc = vals.shape
    single = x.ndim == 1
    xc = x[:, None] if single else x
    c = xc.shape[1]
    nc = -(-n // bc)
    xp = jnp.zeros((nc * bc, c), xc.dtype).at[: n].set(xc[perm])
    # Column-tile view: (nc, bc, c); fetch (nr, k) tiles -> (nr, k, bc, c).
    xt = xp.reshape(nc, bc, c)
    gathered = jnp.take(xt, tile_cols.reshape(-1), axis=0)
    gathered = gathered.reshape(nr, k, bc, c)
    y = jnp.einsum("rkab,rkbc->rac", vals, gathered,
                   preferred_element_type=xc.dtype)
    y = y.reshape(nr * br, c)[: n]
    y = y[inv_perm]
    return y[:, 0] if single else y
