"""Blocked banded Cholesky (solvers/banded.py) vs scipy oracles."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from meshopticalflow_tpu.solvers.banded import (BandedCholeskySolver,
                                                build_band_pattern)


def _mesh_like_spd(n, rng, coupling=3):
    """SPD system with mesh-like locality (so RCM gives a narrow band)."""
    rows, cols, vals = [], [], []
    for off in range(1, coupling + 1):
        i = np.arange(n - off)
        v = rng.normal(size=n - off) * 0.3
        rows += [i, i + off]
        cols += [i + off, i]
        vals += [v, v]
    # a few longer-range couplings to exercise the permutation
    i = np.arange(0, n - 17, 7)
    v = rng.normal(size=i.size) * 0.2
    rows += [i, i + 17]
    cols += [i + 17, i]
    vals += [v, v]
    a = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    d = np.abs(a).sum(axis=1).A.ravel() + 1.0
    a = a + sp.diags(d)
    return a.tocsr()


def _to_ell(a):
    a = a.tocsr()
    a.sort_indices()
    n = a.shape[0]
    nnz = np.diff(a.indptr)
    w = int(nnz.max())
    cols = np.zeros((n, w), np.int64)
    vals = np.zeros((n, w), np.float64)
    rows = np.repeat(np.arange(n), nnz)
    slots = np.arange(a.nnz) - np.repeat(a.indptr[:-1], nnz)
    cols[rows, slots] = a.indices
    vals[rows, slots] = a.data
    first = cols[:, 0]
    pad = np.arange(w)[None, :] >= nnz[:, None]
    cols = np.where(pad, first[:, None], cols)
    return cols.astype(np.int32), vals


@pytest.mark.parametrize("n,nb", [(300, 32), (1000, 64), (513, 128)])
def test_banded_solve_matches_scipy(n, nb):
    rng = np.random.default_rng(n)
    a = _mesh_like_spd(n, rng)
    cols, vals = _to_ell(a)
    pat = build_band_pattern(cols, nb=nb)
    assert pat.bw % nb == 0 and pat.m == -(-n // nb)
    solver = BandedCholeskySolver(pat).factor(jnp.asarray(vals, jnp.float32))
    b = rng.normal(size=n)
    x = np.asarray(solver.solve(jnp.asarray(b, jnp.float32)), np.float64)
    x_ref = spla.spsolve(a.tocsc(), b)
    rel = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert rel < 5e-5  # f32 factorization on a well-conditioned system


def test_banded_multi_rhs_and_dtype():
    rng = np.random.default_rng(0)
    n = 640
    a = _mesh_like_spd(n, rng)
    cols, vals = _to_ell(a)
    pat = build_band_pattern(cols, nb=64)
    solver = BandedCholeskySolver(pat).factor(jnp.asarray(vals, jnp.float32))
    b = rng.normal(size=(n, 5)).astype(np.float32)
    x = np.asarray(solver.solve(jnp.asarray(b)))
    assert x.shape == (n, 5) and x.dtype == np.float32
    for k in range(5):
        x_ref = spla.spsolve(a.tocsc(), b[:, k].astype(np.float64))
        assert np.linalg.norm(x[:, k] - x_ref) / np.linalg.norm(x_ref) < 5e-5


@pytest.mark.parametrize("n,nb,k", [(1000, 64, 4), (513, 32, 2), (700, 64, 1)])
def test_panel_solve_matches_block_solve(n, nb, k):
    """The panelized triangular solves (build_solve_panels) must reproduce
    the nb-block band solve to f32 roundoff — same factor, different
    blocking of the substitution."""
    from meshopticalflow_tpu.solvers.banded import band_solve, band_solve_panels, build_solve_panels

    rng = np.random.default_rng(n + k)
    a = _mesh_like_spd(n, rng)
    cols, vals = _to_ell(a)
    pat = build_band_pattern(cols, nb=nb, bw_pad=k * nb)
    solver = BandedCholeskySolver(pat, solve_panel_k=1,
                                  keep_factor=True).factor(
        jnp.asarray(vals, jnp.float32))
    b = rng.normal(size=(n, 3)).astype(np.float32)
    x_block = np.asarray(band_solve(solver.l_blocks, solver.perm,
                                    solver.inv_perm, jnp.asarray(b),
                                    pat.nb, pat.bw, pat.n))
    dinv, pbelow = build_solve_panels(solver.l_blocks, k)
    assert dinv.shape[1] == k * nb and pbelow.shape[1] == pat.bw
    x_panel = np.asarray(band_solve_panels(dinv, pbelow, solver.perm,
                                           solver.inv_perm, jnp.asarray(b),
                                           pat.n))
    ref = np.linalg.norm(x_block) + 1e-30
    assert np.linalg.norm(x_panel - x_block) / ref < 2e-5


def test_banded_shift_escalation_on_indefinite():
    """A nearly-semidefinite system triggers the escalating shift rather
    than returning NaNs (the f32 analog of LDLt robustness)."""
    rng = np.random.default_rng(3)
    n = 256
    a = _mesh_like_spd(n, rng)
    # remove diagonal dominance: tiny diagonal -> f32 chol is fragile
    a = (a - sp.diags(a.diagonal()) + sp.diags(np.full(n, 1e-7))).tocsr()
    cols, vals = _to_ell(a)
    pat = build_band_pattern(cols, nb=32)
    solver = BandedCholeskySolver(pat)
    solver.factor(jnp.asarray(vals, jnp.float32))
    x = np.asarray(solver.solve(jnp.ones(n, np.float32)))
    assert np.all(np.isfinite(x))


def test_banded_on_real_coarse_flow_system():
    """The actual c1 Whitney flow system of a sphere problem (the layer the
    production MG solves exactly; match target LinearSolvers.h:294-335)."""
    import jax
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.models.base import build_basis, build_flow_system
    from meshopticalflow_tpu.geometry.mesh import build_mesh
    from meshopticalflow_tpu.utils.testing import sphere_signal_pair

    tris, verts, s0, s1 = sphere_signal_pair(3)
    mesh = build_mesh(tris, vertices=verts)
    cfg = FlowConfig(dtype="float64")
    host, dev = build_basis(mesh, cfg)
    t = mesh.n_triangles
    rng = np.random.default_rng(5)
    d_blocks = rng.normal(size=(t, 2, 2))
    d_blocks = d_blocks @ d_blocks.transpose(0, 2, 1) + 0.1 * np.eye(2)
    rhs_t = rng.normal(size=(t, 2))
    sys_vals, _, rhs, _, _ = build_flow_system(
        dev, jnp.asarray(d_blocks), jnp.asarray(rhs_t), jnp.asarray(3e-6))
    cols = np.asarray(dev.ell_cols)
    pat = build_band_pattern(cols, nb=64)
    solver = BandedCholeskySolver(pat).factor(jnp.asarray(sys_vals))
    x = np.asarray(solver.solve(rhs), np.float64)
    n, w = cols.shape
    a = sp.csr_matrix((np.asarray(sys_vals, np.float64).ravel(),
                       (np.repeat(np.arange(n), w), cols.ravel())),
                      shape=(n, n))
    x_ref = spla.spsolve(a.tocsc(), np.asarray(rhs, np.float64))
    num = np.linalg.norm(a @ x - np.asarray(rhs, np.float64))
    den = np.linalg.norm(np.asarray(rhs, np.float64))
    # f32 factorization of a system with condition ~1e6: residual should be
    # small enough that 2-3 refinement rounds reach 1e-11.
    assert num / den < 1e-3
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-2


def test_ell_pcg_banded_multi_matches_scipy():
    # The spectrum purification solve: multi-rhs banded-preconditioned PCG
    # in bounded host-stepped chunks (solvers/banded.py:ell_pcg_banded_multi).
    from meshopticalflow_tpu.solvers.banded import ell_pcg_banded_multi

    rng = np.random.default_rng(7)
    n, c = 800, 6
    a = _mesh_like_spd(n, rng)
    cols, vals = _to_ell(a)
    pat = build_band_pattern(cols, nb=64)
    vals32 = jnp.asarray(vals, jnp.float32)
    solver = BandedCholeskySolver(pat).factor(vals32)
    b = rng.normal(size=(n, c)).astype(np.float32)
    b[:, -1] = 0.0  # a zero column must come back zero, not NaN
    x, iters = ell_pcg_banded_multi(jnp.asarray(cols), vals32, solver,
                                    jnp.asarray(b), tol=1e-7, chunk=8)
    x = np.asarray(x, np.float64)
    assert iters <= 64
    for k in range(c - 1):
        x_ref = spla.spsolve(a.tocsc(), b[:, k].astype(np.float64))
        assert np.linalg.norm(x[:, k] - x_ref) / np.linalg.norm(x_ref) < 1e-4
    assert np.all(x[:, -1] == 0.0)
