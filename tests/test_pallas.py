"""Pallas SpMV kernel + MG solver correctness (interpreter mode on CPU)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from meshopticalflow_tpu.kernels.pallas_spmv import (
    PallasEll, pack_pattern, spmv_tiles, to_tiles, from_tiles)


def _random_ell(n, w, rng, n_cols=None):
    """Random padded-ELL square/rect operator + its scipy form."""
    n_cols = n if n_cols is None else n_cols
    cols = rng.integers(0, n_cols, (n, w)).astype(np.int32)
    vals = rng.standard_normal((n, w))
    rows = np.repeat(np.arange(n), w)
    a = sp.csr_matrix((vals.ravel(), (rows, cols.ravel())), shape=(n, n_cols))
    return cols, vals, a


def test_pack_revalue_spmv_matches_scipy(rng):
    n, w = 300, 7
    cols, vals, a = _random_ell(n, w, rng)
    perm = rng.permutation(n)
    pat = pack_pattern(cols, perm)
    op = PallasEll.from_ell_values(pat, jnp.asarray(pat.slots),
                                   jnp.asarray(vals, jnp.float32),
                                   interpret=True)
    x = rng.standard_normal(n)
    x_t = to_tiles(jnp.asarray(x, jnp.float32), jnp.asarray(perm, jnp.int32),
                   pat.nr)
    y_t = op.apply(x_t)
    y = from_tiles(y_t, jnp.asarray(np.argsort(perm), jnp.int32), n)
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=2e-5, atol=1e-4)


def test_pack_rectangular_transfer(rng):
    n, m, w = 300, 150, 4
    cols, vals, a = _random_ell(n, w, rng, n_cols=m)
    row_perm = rng.permutation(n)
    col_perm = rng.permutation(m)
    pat = pack_pattern(cols, row_perm, col_perm=col_perm, col_n=m)
    op = PallasEll.from_ell_values(pat, jnp.asarray(pat.slots),
                                   jnp.asarray(vals, jnp.float32),
                                   interpret=True)
    x = rng.standard_normal(m)
    x_t = to_tiles(jnp.asarray(x, jnp.float32),
                   jnp.asarray(col_perm, jnp.int32), pat.col_nr)
    y_t = op.apply(x_t)
    y = from_tiles(y_t, jnp.asarray(np.argsort(row_perm), jnp.int32), n)
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=2e-5, atol=1e-4)


def test_bucketed_pack_matches_single_bucket(rng):
    """K-bucketed packing (rows sorted by tile count, per-bucket K) must
    produce BIT-IDENTICAL results to the single-bucket kernel — per-row
    accumulation order is unchanged, only grid processing order moves."""
    n, w = 4096, 9
    # column distribution engineered so block rows have very different tile
    # counts: low rows stay near-diagonal (1-2 tiles), high rows scatter.
    cols = np.empty((n, w), np.int64)
    for i in range(n):
        if (i // 128) % 3 == 0:
            cols[i] = (i + np.arange(w)) % 128 + (i // 128) * 128
        else:
            cols[i] = (i * 37 + np.arange(w) * 977) % n
    vals = rng.standard_normal((n, w))
    rows = np.repeat(np.arange(n), w)
    a = sp.csr_matrix((vals.ravel(), (rows, cols.ravel())), shape=(n, n))
    # permute within 128-blocks (a global shuffle would scatter every block
    # row across all column tiles and defeat the engineered K variation)
    perm = (np.arange(n).reshape(-1, 128)[:, rng.permutation(128)]).ravel()

    pat1 = pack_pattern(cols.astype(np.int32), perm, buckets=1)
    pat3 = pack_pattern(cols.astype(np.int32), perm, buckets=3)
    assert len(pat3.tile_cols) >= 2, [tc.shape for tc in pat3.tile_cols]
    tiles1 = sum(tc.size for tc in pat1.tile_cols)
    tiles3 = sum(tc.size for tc in pat3.tile_cols)
    assert tiles3 < tiles1  # the point of the exercise: fewer streamed tiles

    vj = jnp.asarray(vals, jnp.float32)
    op1 = PallasEll.from_ell_values(pat1, jnp.asarray(pat1.slots), vj,
                                    interpret=True)
    op3 = PallasEll.from_ell_values(pat3, jnp.asarray(pat3.slots), vj,
                                    interpret=True)
    x = rng.standard_normal(n)
    x_t = to_tiles(jnp.asarray(x, jnp.float32), jnp.asarray(perm, jnp.int32),
                   pat1.nr)
    y1 = np.asarray(op1.apply(x_t))
    y3 = np.asarray(op3.apply(x_t))
    np.testing.assert_array_equal(y1, y3)
    inv = jnp.asarray(np.argsort(perm), jnp.int32)
    y = from_tiles(jnp.asarray(y3), inv, n)
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=2e-5, atol=1e-4)

    # multi-rhs path through the same buckets
    from meshopticalflow_tpu.kernels.pallas_spmv import (from_tiles_multi,
                                                         to_tiles_multi)
    xm = rng.standard_normal((n, 5))
    xm_t = to_tiles_multi(jnp.asarray(xm, jnp.float32),
                          jnp.asarray(perm, jnp.int32), pat1.nr)
    ym1 = np.asarray(op1.apply_multi(xm_t))
    ym3 = np.asarray(op3.apply_multi(xm_t))
    np.testing.assert_array_equal(ym1, ym3)
    ym = from_tiles_multi(jnp.asarray(ym3), inv, n, 5)
    np.testing.assert_allclose(np.asarray(ym), a @ xm, rtol=2e-5, atol=1e-4)


def test_pallas_mg3_solver_small_sphere(rng):
    """End-to-end PallasMG3Solver (interpret) vs scipy on a real flow system."""
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.geometry.mesh import build_mesh
    from meshopticalflow_tpu.geometry.subdivide import subdivide_tracked
    from meshopticalflow_tpu.models.base import (
        build_basis, build_flow_system, coarse_system_vals, patch_system_dense)
    from meshopticalflow_tpu.models.coarse import (build_coarse_space,
                                                   build_patch_level)
    from meshopticalflow_tpu.solvers.pallas_mg import (PallasMG3Solver,
                                                       build_mg_pack)
    from tests.conftest import make_sphere_mesh

    tris0, verts0 = make_sphere_mesh(2)
    diag = float(np.linalg.norm(verts0.max(0) - verts0.min(0)))
    uvs = np.zeros((len(tris0), 3, 2))
    tris, verts, _, parent, bary = subdivide_tracked(tris0, verts0, uvs,
                                                     0.3 * diag)
    cfg = FlowConfig(dtype="float32", dog_weight=0.0)
    fine_mesh = build_mesh(tris, vertices=verts)
    coarse_mesh = build_mesh(tris0, vertices=verts0)
    fine_host, fine_dev = build_basis(fine_mesh, cfg)
    cs = build_coarse_space(cfg, fine_mesh, fine_host, coarse_mesh, parent, bary)
    patch, _ = build_patch_level(cfg, coarse_mesh, cs, target_size=4)

    t_f = fine_mesh.n_triangles
    d = rng.normal(size=(t_f, 2, 2))
    d_blocks = jnp.asarray(np.einsum("tab,tcb->tac", d, d) + 0.3 * np.eye(2),
                           jnp.float32)
    rhs_t = jnp.asarray(rng.normal(size=(t_f, 2)), jnp.float32)
    lam = jnp.asarray(3e-4, jnp.float32)
    sys_vals, dt_vals, rhs, fdiag, scale = build_flow_system(
        fine_dev, d_blocks, rhs_t, lam)
    c_vals, _ = coarse_system_vals(cs.coarse_dev, d_blocks, scale, lam)
    a2 = patch_system_dense(patch.q2_idx, patch.q2_wt, d_blocks, scale, lam,
                            patch.s2_dense)
    n1 = cs.coarse_dev.ell_cols.shape[0]
    c_diag = jnp.take_along_axis(
        c_vals, jnp.argmax(cs.coarse_dev.ell_cols == jnp.arange(n1)[:, None],
                           axis=1)[:, None], axis=1)[:, 0]

    pack = build_mg_pack(np.asarray(fine_dev.ell_cols),
                         np.asarray(cs.coarse_dev.ell_cols), cs.p0,
                         np.asarray(patch.p12_idx), np.asarray(patch.p12_wt),
                         int(a2.shape[0]), interpret=True)
    solver = PallasMG3Solver(pack, sys_vals, fdiag, c_vals, c_diag, a2)
    x, stats = solver.solve(rhs, tol=1e-6, max_iters=200, chunk=8)

    # scipy oracle
    n, w = fine_dev.ell_cols.shape
    a = sp.csr_matrix((np.asarray(sys_vals, np.float64).ravel(),
                       (np.repeat(np.arange(n), w),
                        np.asarray(fine_dev.ell_cols).ravel())), shape=(n, n))
    import scipy.sparse.linalg as spla
    x_ref = spla.spsolve(a.tocsc(), np.asarray(rhs, np.float64))
    rel = np.linalg.norm(np.asarray(x, np.float64) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3, (rel, int(stats.iterations), float(stats.rel_residual))
    assert float(stats.rel_residual) < 1e-5

    # Chebyshev-accelerated inner coarse-1 solve: same answer, outer PCG
    # must not take MORE iterations than the plain V-cycle.
    solver_ch = PallasMG3Solver(pack, sys_vals, fdiag, c_vals, c_diag, a2,
                                cheb_k=4)
    x_ch, stats_ch = solver_ch.solve(rhs, tol=1e-6, max_iters=200, chunk=8)
    rel_ch = (np.linalg.norm(np.asarray(x_ch, np.float64) - x_ref)
              / np.linalg.norm(x_ref))
    assert rel_ch < 1e-3, (rel_ch, int(stats_ch.iterations))
    assert float(stats_ch.rel_residual) < 1e-5
    assert int(stats_ch.iterations) <= int(stats.iterations), (
        int(stats_ch.iterations), int(stats.iterations))


def test_spmv_multi_rhs_matches_scipy(rng):
    from meshopticalflow_tpu.kernels.pallas_spmv import (
        PallasEll, from_tiles_multi, spmv_tiles_multi, to_tiles_multi)
    n, w, c = 300, 7, 6
    cols, vals, a = _random_ell(n, w, rng)
    perm = rng.permutation(n)
    pat = pack_pattern(cols, perm)
    op = PallasEll.from_ell_values(pat, jnp.asarray(pat.slots),
                                   jnp.asarray(vals, jnp.float32),
                                   interpret=True)
    x = rng.standard_normal((n, c))
    x_t = to_tiles_multi(jnp.asarray(x, jnp.float32),
                         jnp.asarray(perm, jnp.int32), pat.nr)
    y_t = op.apply_multi(x_t)
    y = from_tiles_multi(y_t, jnp.asarray(np.argsort(perm), jnp.int32), n, c)
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=2e-5, atol=1e-4)


def test_pallas_mg3_multi_solver_smoothing(rng):
    """PallasMG3MultiSolver (interpret) vs scipy on a real smoothing system
    with 6 channel-stacked right-hand sides."""
    import scipy.sparse.linalg as spla
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import (FlowProblem,
                                                   _vertex_pallas_solver)
    from meshopticalflow_tpu.flow.signal import _smooth_system
    from meshopticalflow_tpu.geometry.mesh import build_mesh
    from meshopticalflow_tpu.geometry.subdivide import subdivide_tracked
    from tests.conftest import make_sphere_mesh

    tris0, verts0 = make_sphere_mesh(2)
    diag = float(np.linalg.norm(verts0.max(0) - verts0.min(0)))
    uvs = np.zeros((len(tris0), 3, 2))
    tris, verts, _, parent, bary = subdivide_tracked(tris0, verts0, uvs,
                                                     0.3 * diag)
    cfg = FlowConfig(dtype="float32", dog_weight=0.0, artifact_cache=False)
    mesh = build_mesh(tris, vertices=verts)
    sig = rng.uniform(0, 255, (2, mesh.n_vertices, 3))
    prob = FlowProblem(cfg, mesh, sig, vertices=verts)
    prob.attach_coarse_space(tris0, verts0, parent, bary)
    assert prob.vcoarse is not None and prob.vpatch is not None

    # interpret-mode pack
    import meshopticalflow_tpu.solvers.pallas_mg as pm
    w = jnp.asarray(3e-3, jnp.float32)
    solver, b = _make_interp_solver(prob, w, pm)
    x, stats = solver.solve(b, tol=1e-6, max_iters=200, chunk=8)

    sys_vals, b2, diag_ = _smooth_system(prob.arrays.smooth_ops,
                                         prob.arrays.signals, w)
    cols = np.asarray(prob.arrays.smooth_ops.cols)
    n, wd = cols.shape
    a = sp.csr_matrix((np.asarray(sys_vals, np.float64).ravel(),
                       (np.repeat(np.arange(n), wd), cols.ravel())),
                      shape=(n, n))
    lu = spla.splu(a.tocsc())
    x_ref = lu.solve(np.asarray(b2, np.float64))
    rel = np.linalg.norm(np.asarray(x, np.float64) - x_ref) / \
        np.linalg.norm(x_ref)
    assert rel < 1e-3, (rel, int(stats.iterations), float(stats.rel_residual))


def _make_interp_solver(prob, w, pm):
    """_vertex_pallas_solver with interpret-mode kernels (CPU tests)."""
    import scipy.sparse as sp_
    from meshopticalflow_tpu.flow.signal import _smooth_system

    vcoarse, vpatch, arrays = prob.vcoarse, prob.vpatch, prob.arrays
    idx = np.asarray(vcoarse.p0_idx)
    wt = np.asarray(vcoarse.p0_wt, np.float64)
    v_f, k0 = idx.shape
    v_0 = int(np.asarray(vcoarse.cols0).shape[0])
    p0 = sp_.csr_matrix((wt.ravel(), (np.repeat(np.arange(v_f), k0),
                                      idx.ravel())), shape=(v_f, v_0))
    pack = pm.build_mg_pack(np.asarray(arrays.smooth_ops.cols),
                            np.asarray(vcoarse.cols0), p0,
                            np.asarray(vpatch.p12_idx),
                            np.asarray(vpatch.p12_wt),
                            int(vpatch.m2_dense.shape[0]), interpret=True)
    sys_vals, b, diag_ = _smooth_system(arrays.smooth_ops, arrays.signals, w)
    c_vals = vcoarse.m0_vals + w * vcoarse.k0_vals
    n1 = vcoarse.cols0.shape[0]
    c_diag = jnp.take_along_axis(
        c_vals, jnp.argmax(vcoarse.cols0 == jnp.arange(n1)[:, None],
                           axis=1)[:, None], axis=1)[:, 0]
    a2 = vpatch.m2_dense + w * vpatch.k2_dense
    return pm.PallasMG3MultiSolver(pack, sys_vals, diag_, c_vals, c_diag, a2), b


def test_pack_registry_weakref_gc():
    """_PACKS must not leak dead packs, must never serve a stale pack for a
    recycled key, and must keep serving a LIVE pack under the same uid
    (VERDICT r2 weak #6)."""
    import gc

    from meshopticalflow_tpu.solvers import pallas_mg as pm

    class _FakePack:  # weakref-able stand-in; registration only touches uid
        uid = None

    before = len(pm._PACKS)
    live = _FakePack()
    uid_live = pm._register_pack(live)
    assert pm._register_pack(live) == uid_live  # idempotent (jit-cache key)
    dead_uids = []
    for _ in range(50):
        p = _FakePack()
        dead_uids.append(pm._register_pack(p))
        del p
    gc.collect()
    assert len(pm._PACKS) == before + 1           # dead packs evicted
    assert pm._PACKS.get(uid_live) is live        # live pack still served
    for uid in dead_uids:
        assert uid != uid_live
        assert pm._PACKS.get(uid) is None         # no stale/recycled entries


def test_pallas_mg3_banded_exact_coarse(rng):
    """PallasMG3Solver with the banded-exact c1 solve (VERDICT r2 next #1):
    same answer as scipy, and STRICTLY fewer outer iterations than the
    3-level Jacobi+patch cycle on the same system."""
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.geometry.mesh import build_mesh
    from meshopticalflow_tpu.geometry.subdivide import subdivide_tracked
    from meshopticalflow_tpu.models.base import (
        build_basis, build_flow_system, coarse_system_vals, patch_system_dense)
    from meshopticalflow_tpu.models.coarse import (build_coarse_space,
                                                   build_patch_level)
    from meshopticalflow_tpu.solvers.pallas_mg import (PallasMG3Solver,
                                                       build_c1_band,
                                                       build_mg_pack)
    from tests.conftest import make_sphere_mesh

    tris0, verts0 = make_sphere_mesh(2)
    diag = float(np.linalg.norm(verts0.max(0) - verts0.min(0)))
    uvs = np.zeros((len(tris0), 3, 2))
    tris, verts, _, parent, bary = subdivide_tracked(tris0, verts0, uvs,
                                                     0.3 * diag)
    cfg = FlowConfig(dtype="float32", dog_weight=0.0)
    fine_mesh = build_mesh(tris, vertices=verts)
    coarse_mesh = build_mesh(tris0, vertices=verts0)
    fine_host, fine_dev = build_basis(fine_mesh, cfg)
    cs = build_coarse_space(cfg, fine_mesh, fine_host, coarse_mesh, parent, bary)
    patch, _ = build_patch_level(cfg, coarse_mesh, cs, target_size=4)

    t_f = fine_mesh.n_triangles
    d = rng.normal(size=(t_f, 2, 2))
    d_blocks = jnp.asarray(np.einsum("tab,tcb->tac", d, d) + 0.3 * np.eye(2),
                           jnp.float32)
    rhs_t = jnp.asarray(rng.normal(size=(t_f, 2)), jnp.float32)
    lam = jnp.asarray(3e-4, jnp.float32)
    sys_vals, dt_vals, rhs, fdiag, scale = build_flow_system(
        fine_dev, d_blocks, rhs_t, lam)
    c_vals, _ = coarse_system_vals(cs.coarse_dev, d_blocks, scale, lam)
    a2 = patch_system_dense(patch.q2_idx, patch.q2_wt, d_blocks, scale, lam,
                            patch.s2_dense)
    n1 = cs.coarse_dev.ell_cols.shape[0]
    c_diag = jnp.take_along_axis(
        c_vals, jnp.argmax(cs.coarse_dev.ell_cols == jnp.arange(n1)[:, None],
                           axis=1)[:, None], axis=1)[:, 0]

    pack = build_mg_pack(np.asarray(fine_dev.ell_cols),
                         np.asarray(cs.coarse_dev.ell_cols), cs.p0,
                         np.asarray(patch.p12_idx), np.asarray(patch.p12_wt),
                         int(a2.shape[0]), interpret=True)
    band = build_c1_band(pack, np.asarray(cs.coarse_dev.ell_cols), nb=32)
    solver = PallasMG3Solver(pack, sys_vals, fdiag, c_vals, c_diag, a2,
                             c1_band=band)
    assert solver.c1_l_blocks is not None
    assert 0 < solver.gb_per_iter < 1.0   # streamed-bytes model is sane
    x, stats = solver.solve(rhs, tol=1e-6, max_iters=200, chunk=2)

    n, w = fine_dev.ell_cols.shape
    a = sp.csr_matrix((np.asarray(sys_vals, np.float64).ravel(),
                       (np.repeat(np.arange(n), w),
                        np.asarray(fine_dev.ell_cols).ravel())), shape=(n, n))
    import scipy.sparse.linalg as spla
    x_ref = spla.spsolve(a.tocsc(), np.asarray(rhs, np.float64))
    rel = np.linalg.norm(np.asarray(x, np.float64) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-3, (rel, int(stats.iterations), float(stats.rel_residual))
    assert float(stats.rel_residual) < 1e-5

    base = PallasMG3Solver(pack, sys_vals, fdiag, c_vals, c_diag, a2)
    _, stats_v = base.solve(rhs, tol=1e-6, max_iters=200, chunk=2)
    assert int(stats.iterations) <= int(stats_v.iterations), (
        int(stats.iterations), int(stats_v.iterations))

    # The Chebyshev fine smoother (mg_fine_cheb) must converge to the same
    # answer through the same exact-c1 cycle.
    cheb = PallasMG3Solver(pack, sys_vals, fdiag, c_vals, c_diag, a2,
                           c1_band=band, cheb_fine_deg=2)
    xc, stats_c = cheb.solve(rhs, tol=1e-6, max_iters=200, chunk=2)
    rel_c = np.linalg.norm(np.asarray(xc, np.float64) - x_ref) \
        / np.linalg.norm(x_ref)
    assert rel_c < 1e-3, (rel_c, int(stats_c.iterations))

    # bf16 solve panels (mg_c1_bf16): a ~1e-2-accurate coarse solve is a
    # valid fixed preconditioner — same answer to the same tolerance, and
    # the weaker correction must not blow the iteration count up (<= 2x).
    bf = PallasMG3Solver(pack, sys_vals, fdiag, c_vals, c_diag, a2,
                         c1_band=band, c1_bf16=True)
    assert bf.c1_dinv.dtype == jnp.bfloat16
    assert bf.gb_per_iter < solver.gb_per_iter
    xb, stats_b = bf.solve(rhs, tol=1e-6, max_iters=200, chunk=2)
    rel_b = np.linalg.norm(np.asarray(xb, np.float64) - x_ref) \
        / np.linalg.norm(x_ref)
    assert rel_b < 1e-3, (rel_b, int(stats_b.iterations))
    assert float(stats_b.rel_residual) < 1e-5
    assert int(stats_b.iterations) <= 2 * int(stats.iterations), (
        int(stats_b.iterations), int(stats.iterations))


def test_pallas_mg3_multi_banded_exact(rng):
    """PallasMG3MultiSolver with the banded-exact c1 solve on a real vertex
    smoothing system (the DoG / smoothSignal solves), vs scipy per channel."""
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem, _vertex_pallas_solver
    from meshopticalflow_tpu.flow.signal import _smooth_system
    from meshopticalflow_tpu.models.coarse import (build_vertex_coarse,
                                                   build_vertex_patch_level_from)
    from meshopticalflow_tpu.solvers import pallas_mg as pm
    from meshopticalflow_tpu.geometry.mesh import build_mesh
    from meshopticalflow_tpu.geometry.subdivide import subdivide_tracked
    from tests.conftest import make_sphere_mesh
    import scipy.sparse as ssp
    import scipy.sparse.linalg as spla

    tris0, verts0 = make_sphere_mesh(2)
    diag_len = float(np.linalg.norm(verts0.max(0) - verts0.min(0)))
    uvs = np.zeros((len(tris0), 3, 2))
    tris, verts, _, parent, bary = subdivide_tracked(tris0, verts0, uvs,
                                                     0.3 * diag_len)
    cfg = FlowConfig(dtype="float32", dog_weight=0.0, levels=2)
    mesh = build_mesh(tris, vertices=verts)
    coarse_mesh = build_mesh(tris0, vertices=verts0)
    sig = rng.normal(size=(2, mesh.n_vertices, 3)) * 10 + 128
    prob = FlowProblem(cfg, mesh, sig, vertices=verts)
    vc = build_vertex_coarse(cfg, mesh, coarse_mesh, parent, bary)
    # aggregate coarse triangles into a few patches
    n0 = coarse_mesh.n_vertices
    patch_ids = np.arange(coarse_mesh.n_triangles) % 5
    vp = build_vertex_patch_level_from(cfg, vc.m0_csr, vc.k0_csr,
                                       coarse_mesh, patch_ids)
    import scipy.sparse as sp2
    idx = np.asarray(vc.p0_idx)
    wt = np.asarray(vc.p0_wt, np.float64)
    v_f, k0 = idx.shape
    p0 = sp2.csr_matrix((wt.ravel(), (np.repeat(np.arange(v_f), k0),
                                      idx.ravel())), shape=(v_f, n0))
    pack = pm.build_mg_pack(np.asarray(prob.arrays.smooth_ops.cols),
                            np.asarray(vc.cols0), p0,
                            np.asarray(vp.p12_idx), np.asarray(vp.p12_wt),
                            int(vp.m2_dense.shape[0]), interpret=True)
    vc.pallas_pack = pack
    prob.vcoarse, prob.vpatch = vc, vp
    s_w = jnp.asarray(3e-3, jnp.float32)
    solver, b = _vertex_pallas_solver(prob.arrays, vc, vp, s_w)
    assert solver.c1_l_blocks is not None
    x, stats = solver.solve(b, x0=prob.arrays.signals, tol=1e-7, max_iters=100)

    sys_vals, b2, _ = _smooth_system(prob.arrays.smooth_ops,
                                     prob.arrays.signals, s_w)
    cols = np.asarray(prob.arrays.smooth_ops.cols)
    n, w = cols.shape
    a = ssp.csr_matrix((np.asarray(sys_vals, np.float64).ravel(),
                        (np.repeat(np.arange(n), w), cols.ravel())),
                       shape=(n, n))
    lu = spla.splu(a.tocsc())
    for ch in range(np.asarray(b).shape[1]):
        x_ref = lu.solve(np.asarray(b2, np.float64)[:, ch])
        num = np.linalg.norm(np.asarray(x, np.float64)[:, ch] - x_ref)
        den = np.linalg.norm(x_ref) + 1e-300
        assert num / den < 1e-4, (ch, num / den)


def test_pallas_mg3_banded_breakdown_falls_back(rng):
    """A c1 factorization breakdown must NOT raise in the constructor —
    callers check c1_l_blocks and rebuild with the dense patch coarsest
    (models/base.py) — and solve() on a both-paths-dead solver raises a
    clear error instead of crashing mid-cycle."""
    import pytest as _pytest

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.geometry.mesh import build_mesh
    from meshopticalflow_tpu.geometry.subdivide import subdivide_tracked
    from meshopticalflow_tpu.models.base import build_basis, build_flow_system
    from meshopticalflow_tpu.models.coarse import (build_coarse_space,
                                                   build_patch_level)
    from meshopticalflow_tpu.solvers.pallas_mg import (PallasMG3Solver,
                                                       build_c1_band,
                                                       build_mg_pack)
    from tests.conftest import make_sphere_mesh

    tris0, verts0 = make_sphere_mesh(2)
    diag = float(np.linalg.norm(verts0.max(0) - verts0.min(0)))
    uvs = np.zeros((len(tris0), 3, 2))
    tris, verts, _, parent, bary = subdivide_tracked(tris0, verts0, uvs,
                                                     0.3 * diag)
    cfg = FlowConfig(dtype="float32", dog_weight=0.0)
    fine_mesh = build_mesh(tris, vertices=verts)
    coarse_mesh = build_mesh(tris0, vertices=verts0)
    fine_host, fine_dev = build_basis(fine_mesh, cfg)
    cs = build_coarse_space(cfg, fine_mesh, fine_host, coarse_mesh, parent, bary)
    patch, _ = build_patch_level(cfg, coarse_mesh, cs, target_size=4)
    t_f = fine_mesh.n_triangles
    d = rng.normal(size=(t_f, 2, 2))
    d_blocks = jnp.asarray(np.einsum("tab,tcb->tac", d, d) + 0.3 * np.eye(2),
                           jnp.float32)
    rhs_t = jnp.asarray(rng.normal(size=(t_f, 2)), jnp.float32)
    sys_vals, _, rhs, fdiag, scale = build_flow_system(
        fine_dev, d_blocks, rhs_t, jnp.asarray(3e-4, jnp.float32))
    n1 = cs.coarse_dev.ell_cols.shape[0]
    pack = build_mg_pack(np.asarray(fine_dev.ell_cols),
                         np.asarray(cs.coarse_dev.ell_cols), cs.p0,
                         np.asarray(patch.p12_idx), np.asarray(patch.p12_wt),
                         int(patch.s2_dense.shape[0]), interpret=True)
    band = build_c1_band(pack, np.asarray(cs.coarse_dev.ell_cols), nb=32)
    # Strictly negative-definite c1 values: every Cholesky shift fails.
    c_bad = -jnp.ones_like(jnp.zeros((n1, cs.coarse_dev.ell_cols.shape[1]),
                                     jnp.float32))
    cd_bad = -jnp.ones(n1, jnp.float32)
    broken = PallasMG3Solver(pack, sys_vals, fdiag, c_bad, cd_bad, None,
                             c1_band=band)
    # r4 deferred-check contract: construction does NOT fetch the ok flag
    # (saves a tunnel round trip per level on the universal success path);
    # the breakdown surfaces at the first solve fetch as
    # BandedBreakdownError, and callers rebuild with the dense fallback.
    from meshopticalflow_tpu.solvers.pallas_mg import BandedBreakdownError
    assert broken.c1_l_blocks is not None     # deferred, not yet validated
    assert broken._c1_ok_dev is not None
    with _pytest.raises(BandedBreakdownError):
        broken.solve(rhs, max_iters=2)
    assert broken.c1_l_blocks is None         # total breakdown recorded


def test_adaptive_chunk_prediction():
    """_next_chunk / _update_rho: quantized sizes, pessimistic updates,
    full-chunk fallbacks on missing or degenerate contraction estimates."""
    from meshopticalflow_tpu.solvers.pallas_mg import _next_chunk, _update_rho

    # no history / degenerate rho / already converged -> full chunk
    assert _next_chunk(1.0, 1e-12, None, 24) == 24
    assert _next_chunk(1.0, 1e-12, 1.5, 24) == 24
    assert _next_chunk(0.0, 1e-12, 0.5, 24) == 24
    # tiny remaining gap -> smallest quantized size (chunk//4)
    assert _next_chunk(2e-12, 1e-12, 0.25, 24) == 6
    # moderate gap -> half chunk; big gap -> full chunk
    assert _next_chunk(1e-6, 1e-12, 0.1, 24) == 12
    assert _next_chunk(1.0, 1e-12, 0.9, 24) == 24

    # rho updates keep the WORST (largest) contraction and ignore noise
    r = _update_rho(None, 1.0, 0.01, 8)
    assert 0 < r < 1
    r2 = _update_rho(r, 1.0, 0.5, 8)        # slower chunk -> dominates
    assert r2 > r
    assert _update_rho(r2, 1.0, 2.0, 8) == r2   # residual grew: unchanged
    assert _update_rho(r2, 0.0, 1.0, 8) == r2   # degenerate: unchanged


def test_refine_fixed_pipelined_schedule(rng):
    """The round-4 two-fetch refinement path: a pinned round schedule
    replayed as an async dispatch chain (solve_fixed + on-device df32
    residual) reaches the adaptive loop's accuracy; an undersized schedule
    reports hit=False and still converges through the adaptive fallback."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.geometry.mesh import build_mesh
    from meshopticalflow_tpu.geometry.subdivide import subdivide_tracked
    from meshopticalflow_tpu.models.base import (
        build_basis, build_flow_system, coarse_system_vals)
    from meshopticalflow_tpu.models.coarse import (build_coarse_space,
                                                   build_patch_level)
    from meshopticalflow_tpu.solvers.pallas_mg import (PallasMG3Solver,
                                                       build_c1_band,
                                                       build_mg_pack)
    from meshopticalflow_tpu.solvers.refine import refine_fixed_pipelined
    from tests.conftest import make_sphere_mesh

    tris0, verts0 = make_sphere_mesh(2)
    diag = float(np.linalg.norm(verts0.max(0) - verts0.min(0)))
    uvs = np.zeros((len(tris0), 3, 2))
    tris, verts, _, parent, bary = subdivide_tracked(tris0, verts0, uvs,
                                                     0.3 * diag)
    cfg = FlowConfig(dtype="float32", dog_weight=0.0)
    fine_mesh = build_mesh(tris, vertices=verts)
    coarse_mesh = build_mesh(tris0, vertices=verts0)
    fine_host, fine_dev = build_basis(fine_mesh, cfg)
    cs = build_coarse_space(cfg, fine_mesh, fine_host, coarse_mesh, parent,
                            bary)
    patch, _ = build_patch_level(cfg, coarse_mesh, cs, target_size=4)
    t_f = fine_mesh.n_triangles
    d = rng.normal(size=(t_f, 2, 2))
    d_blocks = jnp.asarray(np.einsum("tab,tcb->tac", d, d) + 0.3 * np.eye(2),
                           jnp.float32)
    rhs_t = jnp.asarray(rng.normal(size=(t_f, 2)), jnp.float32)
    lam = jnp.asarray(3e-4, jnp.float32)
    sys_vals, _, rhs, fdiag, scale = build_flow_system(
        fine_dev, d_blocks, rhs_t, lam)
    c_vals, _ = coarse_system_vals(cs.coarse_dev, d_blocks, scale, lam)
    n1 = cs.coarse_dev.ell_cols.shape[0]
    c_diag = jnp.take_along_axis(
        c_vals, jnp.argmax(cs.coarse_dev.ell_cols == jnp.arange(n1)[:, None],
                           axis=1)[:, None], axis=1)[:, 0]
    pack = build_mg_pack(np.asarray(fine_dev.ell_cols),
                         np.asarray(cs.coarse_dev.ell_cols), cs.p0,
                         np.asarray(patch.p12_idx), np.asarray(patch.p12_wt),
                         int(patch.s2_dense.shape[0]), interpret=True)
    band = build_c1_band(pack, np.asarray(cs.coarse_dev.ell_cols), nb=32)
    solver = PallasMG3Solver(pack, sys_vals, fdiag, c_vals, c_diag, None,
                             c1_band=band)
    inner = lambda r, t, rn2=None: solver.solve(r, tol=max(t, 1e-7),
                                                max_iters=120, b_norm2=rn2)
    x, stats, hit = refine_fixed_pipelined(
        fine_dev.ell_cols, sys_vals, rhs, solver.solve_fixed, (24, 24),
        tol=3e-7, inner_solve=inner)
    assert hit, float(stats.rel_residual)
    assert float(stats.rel_residual) < 3e-7

    n, w = fine_dev.ell_cols.shape
    a = sp.csr_matrix((np.asarray(sys_vals, np.float64).ravel(),
                       (np.repeat(np.arange(n), w),
                        np.asarray(fine_dev.ell_cols).ravel())), shape=(n, n))
    x_ref = spla.spsolve(a.tocsc(), np.asarray(rhs, np.float64))
    rel = np.linalg.norm(np.asarray(x, np.float64) - x_ref) \
        / np.linalg.norm(x_ref)
    assert rel < 1e-4, rel

    # Undersized schedule: misses tol, falls back, still converges.
    x2, stats2, hit2 = refine_fixed_pipelined(
        fine_dev.ell_cols, sys_vals, rhs, solver.solve_fixed, (2,),
        tol=3e-7, inner_solve=inner)
    assert not hit2
    assert float(stats2.rel_residual) < 3e-7
    rel2 = np.linalg.norm(np.asarray(x2, np.float64) - x_ref) \
        / np.linalg.norm(x_ref)
    assert rel2 < 1e-4, rel2
