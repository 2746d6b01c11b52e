"""MG smoother experiments on a real demo-mesh flow system (CPU, scipy).

The Whitney flow system A = dataTerm/||.||_F + lambda * 0.5*(rot + div) is a
mass-like term plus an edge-element operator whose near-kernel (gradient
fields for rot, harmonic pieces) plain point-Jacobi cannot damp — the
classic reason hybrid/Hiptmair smoothers exist for Nedelec/Whitney problems.
This script measures PCG iteration counts to 1e-6 for smoother variants on
the actual level-0 system of the reference demo at a configurable
subdivision, entirely host-side (numpy/scipy mirrors of solvers/mg3.py).

Usage: python scripts/exp_mg.py [eLength=0.02]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.sparse as sp

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp


def build_system(elength):
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import (FlowProblem, _stage_smooth,
                                                   _stage_resample)
    from meshopticalflow_tpu.models.base import build_flow_system

    cfg = FlowConfig(levels=10, dtype="float64", subdivide_edge_length=elength)
    prob = FlowProblem.from_texture_inputs(
        "/root/reference/Example/mesh.ply",
        ("/root/reference/Example/A.png", "/root/reference/Example/B.png"), cfg)
    smoothed, _ = _stage_smooth(prob.arrays, jnp.asarray(cfg.scalar_smooth_weight,
                                                         jnp.float64), cfg,
                                prob.vcoarse, prob.vpatch)
    d_blocks, rhs_t, _, _, _ = _stage_resample(prob.arrays, prob.tfield, smoothed, cfg)
    lam = cfg.resolved_vf_smooth_weight()
    sys_vals, dt_vals, rhs, diag, scale = build_flow_system(
        prob.arrays.basis, d_blocks, rhs_t, jnp.asarray(lam, jnp.float64))
    return prob, d_blocks, np.asarray(sys_vals), np.asarray(rhs), float(scale), lam


def ell_to_csr(cols, vals):
    n, w = cols.shape
    rows = np.repeat(np.arange(n), w)
    return sp.csr_matrix((vals.ravel(), (rows, np.asarray(cols).ravel())), shape=(n, n))


def pcg(a_mv, b, precond, tol=1e-6, max_iters=400):
    x = np.zeros_like(b)
    r = b.copy()
    z = precond(r)
    p = z.copy()
    rz = r @ z
    b2 = b @ b
    for it in range(max_iters):
        ap = a_mv(p)
        alpha = rz / (p @ ap)
        x += alpha * p
        r -= alpha * ap
        if r @ r < tol * tol * b2:
            return x, it + 1
        z = precond(r)
        rz_new = r @ z
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, max_iters


def main():
    elength = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
    t0 = time.time()
    prob, d_blocks, sys_vals, rhs, scale, lam = build_system(elength)
    basis = prob.arrays.basis
    cols = np.asarray(basis.ell_cols)
    a = ell_to_csr(cols, sys_vals)
    n = a.shape[0]
    print(json.dumps({"n": n, "build_s": round(time.time() - t0, 1),
                      "lam": lam, "scale": scale}), flush=True)

    d = a.diagonal().copy()
    d[d == 0] = 1.0
    inv_d = 1.0 / d

    # ---- hierarchy pieces (mirror models/coarse.py handles) ----
    cs, patch = prob.coarse, prob.patch
    from meshopticalflow_tpu.models.base import (coarse_system_vals,
                                                 patch_system_dense)
    c_vals = np.asarray(coarse_system_vals(cs.coarse_dev, d_blocks,
                                           jnp.asarray(scale),
                                           jnp.asarray(lam))[0])
    a1 = ell_to_csr(np.asarray(cs.coarse_dev.ell_cols), c_vals)
    p01 = cs.p0
    a2 = np.asarray(patch_system_dense(patch.q2_idx, patch.q2_wt, d_blocks,
                                       jnp.asarray(scale), jnp.asarray(lam),
                                       patch.s2_dense))
    # p12 padded -> csr
    p12_idx = np.asarray(patch.p12_idx)
    p12_wt = np.asarray(patch.p12_wt)
    n1, k12 = p12_idx.shape
    p12 = sp.csr_matrix((p12_wt.ravel(),
                         (np.repeat(np.arange(n1), k12), p12_idx.ravel())),
                        shape=(n1, a2.shape[0]))
    d1v = a1.diagonal().copy(); d1v[d1v == 0] = 1.0
    inv_d1 = 1.0 / d1v
    import scipy.linalg as sla
    a2c = sla.cho_factor(a2 + 1e-12 * np.eye(a2.shape[0]))

    # ---- Hiptmair pieces: d0 and vertex-projected operators ----
    from meshopticalflow_tpu.models.whitney import build_whitney_basis, edge_reduction
    mesh = prob.mesh
    tri = mesh.triangles.astype(np.int64)
    red, sign, expanded = edge_reduction(mesh.opp)
    e_count = len(expanded)
    exp_t, exp_v = expanded // 3, expanded % 3
    d0_rows = np.repeat(np.arange(e_count), 2)
    d0_cols = np.stack([tri[exp_t, (exp_v + 1) % 3], tri[exp_t, (exp_v + 2) % 3]], 1).ravel()
    d0_vals = np.tile([-1.0, 1.0], e_count)
    d0 = sp.coo_matrix((d0_vals, (d0_rows, d0_cols)),
                       shape=(e_count, mesh.n_vertices)).tocsr()
    av = (d0.T @ a @ d0).tocsr()
    dv = av.diagonal().copy(); dv[dv == 0] = 1.0
    inv_dv = 1.0 / dv
    # coarse level-1 vertex helper
    mesh1 = None  # coarse mesh edges: rebuild from cs.coarse_host? use p01 proj
    av1 = (p01.T @ (d0.T @ a @ d0) @ p01) if False else None

    omega = 0.7

    def jac(mat, invd, r, z, nu):
        for _ in range(nu):
            z = z + omega * invd * (r - mat @ z)
        return z

    def vertex_corr(r, z, nu=2):
        rv = d0.T @ (r - a @ z)
        ev = np.zeros(av.shape[0])
        ev = jac(av, inv_dv, rv, ev, nu)
        return z + d0 @ ev

    def cycle(r, hiptmair=False, nu=4):
        z = jac(a, inv_d, r, np.zeros_like(r), nu - 1)
        if hiptmair:
            z = vertex_corr(r, z)
        r1 = p01.T @ (r - a @ z)
        z1 = jac(a1, inv_d1, r1, np.zeros_like(r1), nu - 1)
        r2 = p12.T @ (r1 - a1 @ z1)
        e2 = sla.cho_solve(a2c, r2)
        z1 = z1 + p12 @ e2
        z1 = jac(a1, inv_d1, r1, z1, nu)
        z = z + p01 @ z1
        if hiptmair:
            z = vertex_corr(r, z)
        return jac(a, inv_d, r, z, nu)

    # exact coarse1 factorization (isolates the patch level's contribution)
    import scipy.sparse.linalg as spla
    a1_lu = None

    def get_a1_lu():
        nonlocal a1_lu
        if a1_lu is None:
            t = time.time()
            a1_lu = spla.splu((a1 + 1e-14 * sp.identity(a1.shape[0])).tocsc())
            print(json.dumps({"a1_splu_s": round(time.time() - t, 1)}), flush=True)
        return a1_lu

    def cycle2_exact(r, nu=4):
        z = jac(a, inv_d, r, np.zeros_like(r), nu)
        r1 = p01.T @ (r - a @ z)
        z1 = get_a1_lu().solve(r1)
        z = z + p01 @ z1
        return jac(a, inv_d, r, z, nu)

    def cycle2_exact_h(r, nu=2):
        # exact coarse-1 + symmetric Hiptmair vertex-space correction: the
        # Whitney near-kernel (gradient fields) is invisible to point
        # smoothers; projecting the residual through d0 onto vertex
        # potentials and Jacobi-smoothing THERE damps it directly.
        z = jac(a, inv_d, r, np.zeros_like(r), nu)
        z = vertex_corr(r, z)
        r1 = p01.T @ (r - a @ z)
        z = z + p01 @ get_a1_lu().solve(r1)
        z = vertex_corr(r, z)
        return jac(a, inv_d, r, z, nu)

    def cycle2_exact_w(r, nu=2, m_corr=2):
        # W-ish: m_corr exact coarse corrections with a smoothing pass between
        z = jac(a, inv_d, r, np.zeros_like(r), nu)
        for i in range(m_corr):
            r1 = p01.T @ (r - a @ z)
            z = z + p01 @ get_a1_lu().solve(r1)
            z = jac(a, inv_d, r, z, nu)
        return z

    def cycle2_exact_cheby(r, deg=4):
        z = cheby(r, np.zeros_like(r), deg)
        r1 = p01.T @ (r - a @ z)
        z = z + p01 @ get_a1_lu().solve(r1)
        return cheby(r, z, deg)

    # Chebyshev fine smoother (needs lambda_max of D^-1 A; power iteration)
    lam_max = None

    def get_lam_max():
        nonlocal lam_max
        if lam_max is None:
            v = np.random.default_rng(0).normal(size=n)
            for _ in range(20):
                v = inv_d * (a @ v)
                v /= np.linalg.norm(v)
            lam_max = float(v @ (inv_d * (a @ v)) / (v @ v)) * 1.05
            print(json.dumps({"lam_max": lam_max}), flush=True)
        return lam_max

    def cheby(r, z, deg):
        # Chebyshev iteration targeting [lam_max/8, lam_max] of D^-1 A.
        lmax = get_lam_max()
        lmin = lmax / 8.0
        theta, delta = (lmax + lmin) / 2, (lmax - lmin) / 2
        res = r - a @ z
        d_vec = inv_d * res / theta
        z = z + d_vec
        alpha_prev = 1.0 / theta
        for _ in range(deg - 1):
            res = r - a @ z
            beta = (delta * alpha_prev / 2.0) ** 2
            alpha = 1.0 / (theta - beta / alpha_prev)
            d_vec = alpha * (inv_d * res) + (alpha * beta / alpha_prev) * d_vec
            z = z + d_vec
            alpha_prev = alpha
        return z

    def cycle3_cheby(r, deg=4):
        z = cheby(r, np.zeros_like(r), deg)
        r1 = p01.T @ (r - a @ z)
        z1 = cheby_l1(r1, np.zeros_like(r1), deg)
        r2 = p12.T @ (r1 - a1 @ z1)
        e2 = sla.cho_solve(a2c, r2)
        z1 = z1 + p12 @ e2
        z1 = cheby_l1(r1, z1, deg)
        z = z + p01 @ z1
        return cheby(r, z, deg)

    lam_max1 = None

    def cheby_l1(r, z, deg):
        nonlocal lam_max1
        if lam_max1 is None:
            v = np.random.default_rng(0).normal(size=a1.shape[0])
            for _ in range(20):
                v = inv_d1 * (a1 @ v)
                v /= np.linalg.norm(v)
            lam_max1 = float(v @ (inv_d1 * (a1 @ v)) / (v @ v)) * 1.05
        lmax, lmin = lam_max1, lam_max1 / 8.0
        theta, delta = (lmax + lmin) / 2, (lmax - lmin) / 2
        res = r - a1 @ z
        d_vec = inv_d1 * res / theta
        z = z + d_vec
        alpha_prev = 1.0 / theta
        for _ in range(deg - 1):
            res = r - a1 @ z
            beta = (delta * alpha_prev / 2.0) ** 2
            alpha = 1.0 / (theta - beta / alpha_prev)
            d_vec = alpha * (inv_d1 * res) + (alpha * beta / alpha_prev) * d_vec
            z = z + d_vec
            alpha_prev = alpha
        return z

    def cyc1(r1, nu=2):
        """Inner 2-level cycle on the coarse1 system (jacobi + patch exact)."""
        z1 = jac(a1, inv_d1, r1, omega * inv_d1 * r1, nu - 1)
        r2 = p12.T @ (r1 - a1 @ z1)
        z1 = z1 + p12 @ sla.cho_solve(a2c, r2)
        return jac(a1, inv_d1, r1, z1, nu)

    # ---- Chebyshev-accelerated inner coarse-1 solve -----------------------
    # cyc1 is a fixed linear SPD preconditioner for a1, so a k-step Chebyshev
    # polynomial in (cyc1 o a1) is ALSO a fixed linear SPD operator — the
    # outer PCG stays valid (no flexible-CG needed). This is the cheap
    # "strong coarse-1 solve": k*(2*nu1+1) extra a1-matvecs per cycle, each
    # ~n1/n ~ 0.19x the cost of a fine matvec.
    pre_bounds = {}

    def get_pre_bounds(nu1=2, iters=25):
        if nu1 in pre_bounds:
            return pre_bounds[nu1]
        rng = np.random.default_rng(1)
        v = rng.normal(size=a1.shape[0])
        for _ in range(iters):
            v = cyc1(a1 @ v, nu1)
            v /= np.linalg.norm(v)
        lmax = float(v @ cyc1(a1 @ v, nu1)) * 1.02
        s = lmax * 1.05
        v = rng.normal(size=a1.shape[0])
        for _ in range(iters):
            v = s * v - cyc1(a1 @ v, nu1)
            v /= np.linalg.norm(v)
        mu = float(v @ (s * v - cyc1(a1 @ v, nu1)))
        lmin = max(s - mu, 1e-3 * lmax) / 1.02
        pre_bounds[nu1] = (lmin, lmax)
        print(json.dumps({"pre_bounds_nu1": nu1, "lmin": lmin, "lmax": lmax}),
              flush=True)
        return pre_bounds[nu1]

    def inner_cheb(r1, k, nu1=2, bounds=None):
        lmin, lmax = bounds if bounds is not None else get_pre_bounds(nu1)
        theta, delta = (lmax + lmin) / 2, (lmax - lmin) / 2
        d_vec = cyc1(r1, nu1) / theta
        z = d_vec.copy()
        alpha_prev = 1.0 / theta
        for _ in range(k - 1):
            res = r1 - a1 @ z
            beta = (delta * alpha_prev / 2.0) ** 2
            alpha = 1.0 / (theta - beta / alpha_prev)
            d_vec = alpha * cyc1(res, nu1) + (alpha * beta / alpha_prev) * d_vec
            z = z + d_vec
            alpha_prev = alpha
        return z

    def cycle_wch(r, k=3, nu=2, nu1=2, bounds=None):
        z = jac(a, inv_d, r, omega * inv_d * r, nu - 1)
        r1 = p01.T @ (r - a @ z)
        z = z + p01 @ inner_cheb(r1, k, nu1, bounds)
        return jac(a, inv_d, r, z, nu)

    def band_stats():
        """RCM bandwidth/profile of a1 — sizes the banded-Cholesky option."""
        perm = sp.csgraph.reverse_cuthill_mckee(a1, symmetric_mode=True)
        ap = a1[perm][:, perm].tocoo()
        width = np.abs(ap.row - ap.col)
        n1 = a1.shape[0]
        lo = ap.tocsr()
        lo.sort_indices()
        semiband = np.zeros(n1, np.int64)
        rows_have = np.diff(lo.indptr) > 0
        idx = np.flatnonzero(rows_have)
        first = lo.indices[lo.indptr[idx]]
        semiband[idx] = np.maximum(idx - first, 0)
        prof = int(semiband.sum())
        print(json.dumps({
            "a1_n": n1, "a1_nnz": int(a1.nnz),
            "rcm_max_semiband": int(width.max()),
            "rcm_mean_semiband": round(float(semiband.mean()), 1),
            "skyline_profile_nnz": prof,
            "banded_chol_gflop": round(prof * float(semiband.mean()) / 1e9, 2),
        }), flush=True)

    def cycle_w(r, nu=2, m=2, nu1=2):
        """2-level outer with m inner cycles on coarse1 (m=1 ~ V, m=2 ~ W)."""
        z = jac(a, inv_d, r, omega * inv_d * r, nu - 1)
        r1 = p01.T @ (r - a @ z)
        z1 = cyc1(r1, nu1)
        for _ in range(m - 1):
            z1 = z1 + cyc1(r1 - a1 @ z1, nu1)
        z = z + p01 @ z1
        return jac(a, inv_d, r, z, nu)

    def rebuilt_patch(target):
        """Patch level at a different aggregate size (models/coarse.py)."""
        from meshopticalflow_tpu.models.coarse import build_patch_level
        from meshopticalflow_tpu.models.base import patch_system_dense
        from meshopticalflow_tpu.geometry.mesh import build_mesh
        t = time.time()
        coarse_mesh = prob._coarse_mesh if hasattr(prob, "_coarse_mesh") else None
        if coarse_mesh is None:
            # rebuild the pre-subdivision mesh exactly as the pipeline does
            from meshopticalflow_tpu.io.ply import read_triangle_mesh
            data = read_triangle_mesh("/root/reference/Example/mesh.ply")
            coarse_mesh = build_mesh(data.faces, vertices=data.vertices)
            prob._coarse_mesh = coarse_mesh
        from meshopticalflow_tpu.config import FlowConfig
        cfgx = FlowConfig(dtype="float64")
        pl2, _ = build_patch_level(cfgx, coarse_mesh, cs, target_size=target)
        a2x = np.asarray(patch_system_dense(pl2.q2_idx, pl2.q2_wt, d_blocks,
                                            jnp.asarray(scale), jnp.asarray(lam),
                                            pl2.s2_dense))
        p12x_idx = np.asarray(pl2.p12_idx)
        p12x_wt = np.asarray(pl2.p12_wt)
        n1x, k12x = p12x_idx.shape
        p12x = sp.csr_matrix((p12x_wt.ravel(),
                              (np.repeat(np.arange(n1x), k12x), p12x_idx.ravel())),
                             shape=(n1x, a2x.shape[0]))
        a2xc = sla.cho_factor(a2x + 1e-12 * np.eye(a2x.shape[0]))
        print(json.dumps({"patch_target": target, "n2": a2x.shape[0],
                          "build_s": round(time.time() - t, 1)}), flush=True)
        return p12x, a2xc

    def cycle_patch(r, p12x, a2xc, nu=2):
        z = jac(a, inv_d, r, omega * inv_d * r, nu - 1)
        r1 = p01.T @ (r - a @ z)
        z1 = jac(a1, inv_d1, r1, omega * inv_d1 * r1, nu - 1)
        r2 = p12x.T @ (r1 - a1 @ z1)
        e2 = sla.cho_solve(a2xc, r2)
        z1 = z1 + p12x @ e2
        z1 = jac(a1, inv_d1, r1, z1, nu)
        z = z + p01 @ z1
        return jac(a, inv_d, r, z, nu)

    def make_patch_variant(target, nu=2):
        p12x, a2xc = rebuilt_patch(target)
        return lambda r: cycle_patch(r, p12x, a2xc, nu=nu)

    a_mv = lambda v: a @ v
    variants = {
        "jacobi_only": lambda r: inv_d * r,
        "mg3_nu2": lambda r: cycle(r, hiptmair=False, nu=2),
        "mg3_nu4": lambda r: cycle(r, hiptmair=False, nu=4),
        "mg3_nu6": lambda r: cycle(r, hiptmair=False, nu=6),
        "mg3_nu2_hiptmair": lambda r: cycle(r, hiptmair=True, nu=2),
        "mg3_nu4_hiptmair": lambda r: cycle(r, hiptmair=True, nu=4),
        "mg2_exact_nu1": lambda r: cycle2_exact(r, nu=1),
        "mg2_exact_nu2": lambda r: cycle2_exact(r, nu=2),
        "mg2_exact_nu3": lambda r: cycle2_exact(r, nu=3),
        "mg2_exact_nu4": lambda r: cycle2_exact(r, nu=4),
        "mg2_exact_nu1_h": lambda r: cycle2_exact_h(r, nu=1),
        "mg2_exact_nu2_h": lambda r: cycle2_exact_h(r, nu=2),
        "mg2_exact_w2_nu1": lambda r: cycle2_exact_w(r, nu=1, m_corr=2),
        "mg2_exact_w2_nu2": lambda r: cycle2_exact_w(r, nu=2, m_corr=2),
        "mg2_exact_w3_nu1": lambda r: cycle2_exact_w(r, nu=1, m_corr=3),
        "mg2_exact_cheby2": lambda r: cycle2_exact_cheby(r, deg=2),
        "mg2_exact_cheby3": lambda r: cycle2_exact_cheby(r, deg=3),
        "mg2_exact_cheby4": lambda r: cycle2_exact_cheby(r, deg=4),
        "mg2_exact_cheby6": lambda r: cycle2_exact_cheby(r, deg=6),
        "mg3_cheby4": lambda r: cycle3_cheby(r, deg=4),
        "mg3_cheby6": lambda r: cycle3_cheby(r, deg=6),
        "w_nu1_m1": lambda r: cycle_w(r, nu=1, m=1),
        "w_nu2_m1": lambda r: cycle_w(r, nu=2, m=1),
        "w_nu2_m2": lambda r: cycle_w(r, nu=2, m=2),
        "w_nu2_m3": lambda r: cycle_w(r, nu=2, m=3),
        "w_nu2_m2_nu1_4": lambda r: cycle_w(r, nu=2, m=2, nu1=4),
        "w_nu4_m2": lambda r: cycle_w(r, nu=4, m=2),
        "wch_k2": lambda r: cycle_wch(r, k=2),
        "wch_k3": lambda r: cycle_wch(r, k=3),
        "wch_k4": lambda r: cycle_wch(r, k=4),
        "wch_k6": lambda r: cycle_wch(r, k=6),
        "wch_k3_nu1_4": lambda r: cycle_wch(r, k=3, nu1=4),
        # fixed conservative bounds (production can't afford per-solve
        # eigenvalue estimation; systems change every refinement round)
        "wch_k4_fix": lambda r: cycle_wch(r, k=4, bounds=(0.02, 1.05)),
        "wch_k6_fix": lambda r: cycle_wch(r, k=6, bounds=(0.02, 1.05)),
        "wch_k4_fix_loose": lambda r: cycle_wch(r, k=4, bounds=(0.01, 1.10)),
        "wch_k6_fix_loose": lambda r: cycle_wch(r, k=6, bounds=(0.01, 1.10)),
    }
    for tgt in (4, 6, 8):
        for nu_ in (2, 4):
            variants[f"patch_t{tgt}_nu{nu_}"] = \
                (lambda t=tgt, nv=nu_: make_patch_variant(t, nv))
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else \
        ["jacobi_only", "mg3_nu4", "mg3_nu4_hiptmair"]
    results = {}
    if "band_stats" in names:
        band_stats()
        names.remove("band_stats")
    for name in names:
        pre = variants[name]
        if name.startswith("patch_t"):
            pre = pre()  # deferred build
        t0 = time.time()
        _, iters = pcg(a_mv, rhs, pre, tol=1e-6,
                       max_iters=3000 if name == "jacobi_only" else 300)
        results[name] = {"iters": iters, "s": round(time.time() - t0, 1)}
        print(json.dumps({name: results[name]}), flush=True)


if __name__ == "__main__":
    main()
