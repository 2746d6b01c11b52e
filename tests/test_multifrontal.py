"""Multifrontal direct solver (solvers/multifrontal.py) vs scipy.

The schedule/structure invariants (closed borders, depth-by-depth children)
are asserted inside build_nd_pack; these tests check the NUMERIC device
factorization + triangular sweeps against a host f64 sparse direct solve on
real basis systems (the reference's per-level Cholesky,
LinearSolvers.h:294-299, rebuilt as batched dense fronts)."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax.numpy as jnp

from meshopticalflow_tpu.config import FlowConfig, VectorFieldMode
from meshopticalflow_tpu.geometry.mesh import build_mesh
from meshopticalflow_tpu.models.base import build_basis, build_flow_system
from meshopticalflow_tpu.solvers.multifrontal import (
    NDSolver, _factor_jit, _solve_jit, build_nd_pack, dof_positions)

from conftest import make_grid_mesh, make_sphere_mesh


def _system(mesh, tris, verts, mode, seed=7, lam=1e-3):
    cfg = FlowConfig(vf_mode=mode, dtype="float64")
    host, dev = build_basis(mesh, cfg)
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(mesh.n_triangles, 2, 2)) * 0.5
    d_blocks = np.einsum("tak,tbk->tab", a, a) \
        + 1e-3 * np.eye(2)[None]   # SPD blocks
    rhs_t = rng.normal(size=(mesh.n_triangles, 2))
    sys_vals, _, rhs, _, _ = build_flow_system(
        dev, jnp.asarray(d_blocks), jnp.asarray(rhs_t), lam)
    cols_h = np.asarray(dev.ell_cols)
    n, w = cols_h.shape
    a_host = sp.csr_matrix(
        (np.asarray(sys_vals, np.float64).ravel(),
         (np.repeat(np.arange(n), w), cols_h.astype(np.int64).ravel())),
        shape=(n, n))
    pos = dof_positions(tris, verts, host.p_idx, host.n_coeffs)
    return dev, sys_vals, rhs, a_host, pos


@pytest.fixture(scope="module")
def sphere():
    tris, verts = make_sphere_mesh(3)
    return build_mesh(tris, vertices=verts), tris, verts


@pytest.mark.parametrize("leaf", [16, 48])
def test_factor_solve_matches_scipy_f64(sphere, leaf):
    dev, sys_vals, rhs, a_host, pos = _system(*sphere, VectorFieldMode.WHITNEY)
    pack = build_nd_pack(np.asarray(dev.ell_cols), pos, leaf=leaf)
    levels_dev = pack.device()
    factors = _factor_jit(levels_dev, sys_vals)
    x = np.asarray(_solve_jit(levels_dev, factors, rhs))
    b = np.asarray(rhs, np.float64)
    rel = np.linalg.norm(a_host @ x - b) / np.linalg.norm(b)
    assert rel < 1e-11

    # Second rhs reuses the factors.
    rng = np.random.default_rng(1)
    b2 = rng.normal(size=len(b))
    x2 = np.asarray(_solve_jit(levels_dev, factors, jnp.asarray(b2)))
    rel2 = np.linalg.norm(a_host @ x2 - b2) / np.linalg.norm(b2)
    assert rel2 < 1e-11


def test_boundary_mesh_conformal_semidefinite():
    """Open (boundary) mesh + conformal basis: the system is SEMI-definite
    (exact null space — even host f64 Cholesky breaks). The shifted factor
    is a preconditioner; refinement restores true-residual accuracy for a
    rhs in range(A)."""
    from meshopticalflow_tpu.solvers.refine import refine_loop

    tris, verts = make_grid_mesh(9, jitter=0.02, seed=3)
    mesh = build_mesh(tris, vertices=verts)
    dev, sys_vals, rhs, a_host, pos = _system(mesh, tris, verts,
                                              VectorFieldMode.CONFORMAL)
    pack = build_nd_pack(np.asarray(dev.ell_cols), pos, leaf=24)
    solver = NDSolver(pack, pack.device(), sys_vals,
                      diag_slot=dev.diag_slot, shift_rel=1e-9)
    x, stats = refine_loop(
        dev.ell_cols, sys_vals, rhs,
        lambda r, tol, rn2=None: solver.solve(r, tol, None, rn2),
        tol=1e-11, inner_floor=1e-12)
    b = np.asarray(rhs, np.float64)
    rel = np.linalg.norm(a_host @ np.asarray(x, np.float64) - b) \
        / np.linalg.norm(b)
    assert rel < 1e-9


def test_pipeline_mf_backend_matches_mg():
    """flow_backend="mf" through the FULL pipeline (production MG config)
    lands on the same trajectory as the iterative path: both refine every
    level solve to the same 3e-9 outer tolerance, so the nonlinear
    coarse-to-fine trajectories must agree to solver-noise level."""
    import dataclasses

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.utils.testing import synthetic_sphere_problem

    cfg = FlowConfig(dog_weight=0.0, levels=4)
    base = synthetic_sphere_problem(cfg, hierarchy=True)
    res_mg = base.run()
    prob = synthetic_sphere_problem(
        dataclasses.replace(cfg, flow_backend="mf"), hierarchy=True)
    assert prob._ensure_nd() is not None   # vertices present -> mf engages
    res_mf = prob.run()

    tf_mg, tf_mf = np.asarray(res_mg.tfield), np.asarray(res_mf.tfield)
    scale = np.abs(tf_mg).max()
    assert np.abs(tf_mf - tf_mg).max() <= 1e-4 * scale
    err_mg = res_mg.metrics[-1]["alignment_error"]
    err_mf = res_mf.metrics[-1]["alignment_error"]
    assert abs(err_mf - err_mg) <= 1e-5 * abs(err_mg) + 1e-12


def test_ndsolver_f32_with_refinement(sphere):
    """The production shape: f32 factorization wrapped in iterative
    refinement reaches the flow pipeline's outer tolerance."""
    from meshopticalflow_tpu.solvers.refine import refine_loop

    dev, sys_vals, rhs, a_host, pos = _system(*sphere, VectorFieldMode.WHITNEY)
    pack = build_nd_pack(np.asarray(dev.ell_cols), pos, leaf=32)
    solver = NDSolver(pack, pack.device(), sys_vals.astype(jnp.float32))
    b32 = rhs.astype(jnp.float32)
    x, stats = refine_loop(
        dev.ell_cols, sys_vals.astype(jnp.float32), b32,
        lambda r, tol, rn2=None: solver.solve(r, tol, None, rn2),
        tol=3e-9, inner_floor=1e-6)
    assert float(stats.rel_residual) < 3e-9
    # True residual against the f32-CAST system (production semantics: the
    # device system IS f32; casting the matrix moves it by ~eps*||A||).
    n, w = np.asarray(dev.ell_cols).shape
    a32 = sp.csr_matrix(
        (np.asarray(sys_vals, np.float32).astype(np.float64).ravel(),
         (np.repeat(np.arange(n), w),
          np.asarray(dev.ell_cols, np.int64).ravel())), shape=(n, n))
    b = np.asarray(rhs, np.float32).astype(np.float64)
    rel = np.linalg.norm(a32 @ np.asarray(x, np.float64) - b) / np.linalg.norm(b)
    # x comes back as a single f32 vector (the df32 hi/lo pair reached
    # stats.rel_residual; re-rounding hi alone costs ~eps_f32) — the same
    # contract as the MG-PCG production path.
    assert rel < 5e-7
    assert int(stats.iterations) <= 5   # direct rounds, not PCG iterations
