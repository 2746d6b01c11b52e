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


def test_three_level_solver_with_bsr_fine():
    """mg3 with a block-ELL fine operator matches the ELL path and scipy."""
    import scipy.sparse.linalg as spla

    from meshopticalflow_tpu.ops.ell import ell_from_scipy
    from meshopticalflow_tpu.solvers.mg3 import ThreeLevelSolver

    n = 128
    a = sp.diags([-1.0, 2.5, -1.0], [-1, 0, 1], shape=(n, n)).tocsr()

    def agg_prolong(n_fine, factor):
        rows = np.arange(n_fine)
        return sp.coo_matrix((np.ones(n_fine), (rows, rows // factor)),
                             shape=(n_fine, n_fine // factor)).tocsr()

    p01 = agg_prolong(n, 4)
    p12 = agg_prolong(n // 4, 4)
    c1 = (p01.T @ a @ p01).tocsr()
    a2 = np.asarray((p12.T @ c1 @ p12).todense())

    h_f, h_c = ell_from_scipy(a), ell_from_scipy(c1)
    args = (jnp.asarray(h_f.cols), jnp.asarray(h_f.vals.astype(np.float32)),
            jnp.asarray(a.diagonal().astype(np.float32)),
            jnp.asarray(h_c.cols), jnp.asarray(h_c.vals.astype(np.float32)),
            jnp.asarray(np.arange(n)[:, None] // 4, jnp.int32),
            jnp.ones((n, 1), jnp.float32),
            jnp.asarray(a2.astype(np.float32)),
            jnp.asarray(np.arange(n // 4)[:, None] // 4, jnp.int32),
            jnp.ones((n // 4, 1), jnp.float32))

    b = np.random.default_rng(7).standard_normal(n).astype(np.float32)
    ref = spla.spsolve(a.astype(np.float64), b.astype(np.float64))

    x_ell, st_ell = ThreeLevelSolver(*args).solve(jnp.asarray(b), tol=1e-10)
    bsr = BlockEllDevice.from_host(block_ell_from_scipy(a, 8, 16))
    c1_bsr = BlockEllDevice.from_host(block_ell_from_scipy(c1, 8, 16))
    x_bsr, st_bsr = ThreeLevelSolver(*args, fine_bsr=bsr, c1_bsr=c1_bsr).solve(
        jnp.asarray(b), tol=1e-10)

    scale = np.abs(ref).max()
    assert np.abs(np.asarray(x_ell) - ref).max() <= 1e-4 * scale
    assert np.abs(np.asarray(x_bsr) - ref).max() <= 1e-4 * scale
    assert int(st_bsr.iterations) <= int(st_ell.iterations) + 2
