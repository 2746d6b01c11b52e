import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from meshopticalflow_tpu.config import FlowConfig, VectorFieldMode
from meshopticalflow_tpu.geometry.mesh import build_mesh
from meshopticalflow_tpu.geometry.subdivide import subdivide_tracked
from meshopticalflow_tpu.models.base import build_basis, build_flow_system, prolong
from meshopticalflow_tpu.models.coarse import build_coarse_space
from tests.conftest import make_sphere_mesh


def _prolongation_scipy(host):
    t, k = host.p_idx.shape
    rows = np.repeat(np.arange(2 * t).reshape(t, 2), k, axis=1).ravel()
    cols = np.repeat(host.p_idx[:, None, :], 2, axis=1).ravel()
    return sp.coo_matrix((host.p_wt.ravel(), (rows, cols)),
                         shape=(2 * t, host.n_coeffs)).tocsr()


@pytest.fixture(scope="module", params=[VectorFieldMode.WHITNEY,
                                        VectorFieldMode.CONFORMAL,
                                        VectorFieldMode.CONNECTION])
def spaces(request):
    tris_c, verts_c = make_sphere_mesh(1)
    # Subdivide by edge threshold (non-uniform splits exercised via jitter-free
    # sphere: all edges similar, splits twice).
    tris_f, verts_f, _, parent, bary = subdivide_tracked(tris_c, verts_c, None, 0.28)
    assert len(tris_f) > len(tris_c)
    fine_mesh = build_mesh(tris_f, vertices=verts_f)
    coarse_mesh = build_mesh(tris_c, vertices=verts_c)
    cfg = FlowConfig(vf_mode=request.param, dtype="float64")
    fine_host, fine_dev = build_basis(fine_mesh, cfg)
    cs = build_coarse_space(cfg, fine_mesh, fine_host, coarse_mesh, parent, bary)
    return cfg, fine_mesh, coarse_mesh, fine_host, fine_dev, cs


def test_composed_weights_match_scipy(spaces):
    cfg, fine_mesh, coarse_mesh, fine_host, fine_dev, cs = spaces
    rng = np.random.default_rng(0)
    c = rng.normal(size=cs.coarse_host.n_coeffs)
    pf = _prolongation_scipy(fine_host)
    expect = (pf @ (cs.p0 @ c)).reshape(-1, 2)
    got = np.asarray(prolong(cs.coarse_dev, jnp.asarray(c)))
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_galerkin_system_matches(spaces):
    """Coarse assembled system == P0^T (fine system) P0 for shared D, lambda."""
    cfg, fine_mesh, coarse_mesh, fine_host, fine_dev, cs = spaces
    rng = np.random.default_rng(1)
    a = rng.normal(size=(fine_mesh.n_triangles, 2, 2)) * 0.3
    d_blocks = jnp.asarray(np.einsum("tak,tbk->tab", a, a))
    rhs_t = jnp.asarray(rng.normal(size=(fine_mesh.n_triangles, 2)))
    lam = jnp.asarray(1e-3)
    f_sys, f_dt, f_rhs, _, _ = build_flow_system(fine_dev, d_blocks, rhs_t, lam)
    # Coarse system with the FINE Frobenius scale for Galerkin consistency.
    from meshopticalflow_tpu.models.base import data_term_ell_vals, reduce_rhs
    dt_flat_f = np.asarray(data_term_ell_vals(fine_dev, d_blocks))
    scale = 1.0 / np.sqrt((dt_flat_f ** 2).sum())
    dt0 = np.asarray(data_term_ell_vals(cs.coarse_dev, d_blocks)) * scale
    n0, w0 = cs.coarse_dev.ell_cols.shape
    c_sys = dt0.reshape(n0, w0) + float(lam) * np.asarray(cs.coarse_dev.s_vals)

    # scipy reference: P0^T A P0
    def ell_to_scipy(cols, vals):
        n, w = cols.shape
        return sp.csr_matrix((np.asarray(vals).ravel(),
                              (np.repeat(np.arange(n), w), np.asarray(cols).ravel())),
                             shape=(n, n))
    a_f = ell_to_scipy(fine_dev.ell_cols, f_sys)
    a_c = ell_to_scipy(cs.coarse_dev.ell_cols, c_sys)
    expect = (cs.p0.T @ a_f @ cs.p0).toarray()
    np.testing.assert_allclose(a_c.toarray(), expect, atol=1e-10)
    # And the restricted rhs.
    c_rhs = np.asarray(reduce_rhs(cs.coarse_dev, rhs_t)) * scale
    np.testing.assert_allclose(c_rhs, cs.p0.T @ np.asarray(f_rhs), atol=1e-10)


def test_p0_gather_matches_matrix(spaces):
    cfg, fine_mesh, coarse_mesh, fine_host, fine_dev, cs = spaces
    rng = np.random.default_rng(2)
    c = rng.normal(size=cs.coarse_host.n_coeffs)
    via_gather = (cs.p0_wt * c[cs.p0_idx]).sum(1)
    np.testing.assert_allclose(via_gather, cs.p0 @ c, atol=1e-12)


def test_twolevel_solver_converges_fast(spaces):
    """Two-level MG-PCG reaches 1e-8 in a few iterations and matches spsolve."""
    import scipy.sparse.linalg as spla
    from meshopticalflow_tpu.models.base import build_flow_system, coarse_system_vals
    from meshopticalflow_tpu.solvers.twolevel import TwoLevelSolver
    cfg, fine_mesh, coarse_mesh, fine_host, fine_dev, cs = spaces
    rng = np.random.default_rng(3)
    a = rng.normal(size=(fine_mesh.n_triangles, 2, 2)) * 0.3
    d_blocks = jnp.asarray(np.einsum("tak,tbk->tab", a, a))
    rhs_t = jnp.asarray(rng.normal(size=(fine_mesh.n_triangles, 2)))
    lam = jnp.asarray(1e-3)
    f_sys, f_dt, f_rhs, f_diag, scale = build_flow_system(fine_dev, d_blocks, rhs_t, lam)
    c_vals, _ = coarse_system_vals(cs.coarse_dev, d_blocks, scale, lam)
    solver = TwoLevelSolver(fine_dev.ell_cols, f_sys, f_diag,
                            cs.coarse_dev.ell_cols, c_vals,
                            cs.p0_idx_dev, cs.p0_wt_dev)
    # Mode-specific expectations: Whitney (the default production mode)
    # converges fast; the conformal coarse system is singular (constants),
    # so its cycle stalls near 1e-6 — iterative refinement handles the rest.
    budgets = {"whitney": (1e-9, 45), "conformal": (1e-5, 150),
               "connection": (1e-5, 150)}
    key = next(k for k in budgets if k in fine_host.name)
    tol, max_it = budgets[key]
    x, stats = solver.solve(f_rhs, tol=tol, max_iters=max_it)
    assert float(stats.rel_residual) < tol * 50, (key, float(stats.rel_residual))
    n, w = fine_dev.ell_cols.shape
    a_f = sp.csc_matrix((np.asarray(f_sys).ravel(),
                         (np.repeat(np.arange(n), w), np.asarray(fine_dev.ell_cols).ravel())),
                        shape=(n, n))
    x_ref = spla.spsolve(a_f, np.asarray(f_rhs))
    from meshopticalflow_tpu.models.base import prolong
    tf = np.asarray(prolong(fine_dev, x))
    tf_ref = np.asarray(prolong(fine_dev, jnp.asarray(x_ref)))
    atol = 100 * tol * max(1.0, np.abs(tf_ref).max())
    np.testing.assert_allclose(tf, tf_ref, atol=atol)


def test_three_level_pipeline_matches_host_cholesky(tmp_path):
    """Whitney + subdivision: the fully on-device 3-level MG path produces
    the same flow as exact host solves."""
    from meshopticalflow_tpu.flow.pipeline import FlowProblem
    from meshopticalflow_tpu.io.ply import write_ply_textured
    from meshopticalflow_tpu.io.png import write_png_rgb
    n = 7
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], 1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, (i + 1) * n + j, (i + 1) * n + j + 1, i * n + j + 1
            tris += [[a, b, c], [a, c, d]]
    tris = np.array(tris, np.int32)
    uvs = verts[tris][:, :, :2]
    size = 48
    uu, vv = np.meshgrid(np.arange(size) / (size - 1), np.arange(size) / (size - 1),
                         indexing="xy")

    def blob(cx, cy):
        img = 255 * np.exp(-(((uu - cx) ** 2 + (vv - cy) ** 2) / 0.02))
        return np.flipud(np.stack([img] * 3, -1)).astype(np.uint8)

    write_ply_textured(str(tmp_path / "m.ply"), verts, tris, uvs)
    write_png_rgb(str(tmp_path / "A.png"), blob(0.42, 0.5))
    write_png_rgb(str(tmp_path / "B.png"), blob(0.58, 0.5))
    paths = (str(tmp_path / "A.png"), str(tmp_path / "B.png"))

    base = dict(levels=2, dtype="float64", dog_weight=0.0,
                subdivide_edge_length=0.08, scalar_smooth_weight=1e-3,
                vf_smooth_weight=1e-5, cg_tol=1e-9, cg_max_iters=1000,
                flow_mg_levels=3)
    p_mg = FlowProblem.from_texture_inputs(str(tmp_path / "m.ply"), paths,
                                           FlowConfig(**base))
    assert p_mg.patch is not None and p_mg.vpatch is not None  # 3-level active
    r_mg = p_mg.run()
    p_hc = FlowProblem.from_texture_inputs(str(tmp_path / "m.ply"), paths,
                                           FlowConfig(**base, use_host_cholesky=True))
    r_hc = p_hc.run()
    scale = max(1.0, np.abs(r_hc.tfield).max())
    np.testing.assert_allclose(r_mg.tfield, r_hc.tfield, atol=2e-5 * scale)
