"""Block-ELL (ops/bsr.py) correctness vs scipy."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from meshopticalflow_tpu.ops.bsr import (BlockEllDevice, block_ell_from_scipy,
                                         rcm_permutation)


@pytest.fixture(scope="module")
def random_sym():
    a = sp.random(997, 997, density=0.01, random_state=0, format="csr")
    return (a + a.T).tocsr()


@pytest.mark.parametrize("br,bc", [(8, 128), (32, 128), (128, 128), (32, 64)])
def test_matvec_matches_scipy(random_sym, br, bc):
    a = random_sym
    h = block_ell_from_scipy(a, br, bc)
    dev = BlockEllDevice.from_host(h)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(a.shape[0]).astype(np.float32)
    y = np.asarray(dev.matvec(jnp.asarray(x)))
    ref = a @ x
    assert np.abs(y - ref).max() <= 1e-5 * np.abs(ref).max()
    xm = rng.standard_normal((a.shape[0], 3)).astype(np.float32)
    ym = np.asarray(dev.matvec(jnp.asarray(xm)))
    refm = a @ xm
    assert np.abs(ym - refm).max() <= 1e-5 * np.abs(refm).max()


def test_slot_map_revaluation(random_sym):
    a = random_sym
    h = block_ell_from_scipy(a, 16, 128, with_slot_map=True)
    a2 = a.copy()
    a2.data = np.random.default_rng(2).standard_normal(a2.data.shape)
    v2 = np.zeros(h.vals.size, h.vals.dtype)
    np.add.at(v2, h.slot_of_nnz, a2.data.astype(h.vals.dtype))
    dev = BlockEllDevice.from_host(h)
    dev2 = BlockEllDevice(dev.tile_cols, jnp.asarray(v2.reshape(h.vals.shape)),
                          dev.perm, dev.inv_perm, a.shape[0])
    x = np.random.default_rng(3).standard_normal(a.shape[0]).astype(np.float32)
    y = np.asarray(dev2.matvec(jnp.asarray(x)))
    ref = a2 @ x
    assert np.abs(y - ref).max() <= 1e-5 * np.abs(ref).max()


def test_rcm_reduces_bandwidth(random_sym):
    # A path graph has bandwidth 1 under RCM no matter the input labeling.
    n = 64
    rng = np.random.default_rng(4)
    lab = rng.permutation(n)
    i = lab[:-1]
    j = lab[1:]
    a = sp.coo_matrix((np.ones(n - 1), (i, j)), shape=(n, n))
    a = (a + a.T).tocsr()
    perm = rcm_permutation(a)
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    ii, jj = a.nonzero()
    assert np.abs(inv[ii] - inv[jj]).max() == 1
