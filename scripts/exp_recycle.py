"""Cross-level Krylov subspace RECYCLING on the real flow-level sequence.

VERDICT r3 next #2(a): deflate each level's MG-PCG with the dominant Ritz
vectors harvested from the PREVIOUS level's CG coefficients — distinct from
the measured-out x0 warm start (the warm start moves the initial residual;
deflation removes the slow eigenmodes of the preconditioned operator from
the Krylov iteration itself).  The flow DoF space is level-invariant (the
same Whitney edge basis at every level; only the data term and the weights
change), so level L's Ritz vectors are candidates for level L+1.

Cost model on device (why this could pay): the per-iteration overhead of
k-column deflation is two (n,k) GEMVs ≈ 2nk f32 reads — at n=324,600 and
k=16 that is ~42 MB/iter against the ~2.5 GB/iter the production 2-level
cycle already moves (nu=2 Jacobi + EXACT banded c1 solve) — under 2 %.  The
setup AW = A @ W reads the fine matrix ONCE for all k columns.  So ANY
meaningful iteration cut is a near-free win; the question is purely whether
the slow modes persist across levels.

Protocol (host f64, CPU, mirrors scripts/exp_schwarz.py):
  1. CAPTURE: run the production pipeline (use_host_cholesky oracle) at the
     bench mesh scale and record each level's (d_blocks, rhs_t, v_weight)
     to /tmp/exp_recycle_cap/.
  2. REPLAY: per level, assemble A_L / coarse a1_L, run the production
     baseline cycle (mg2_exact_nu2) PCG to 1e-6 while harvesting the
     Lanczos basis from the CG coefficients; then re-solve deflated with
       - defl_prev_kK : K smallest Ritz vectors of level L-1  (the design)
       - defl_self_kK : K smallest Ritz vectors of level L itself (upper
                        bound — how much deflation could EVER save here)
     and record iteration counts + the principal angles between the
     successive levels' Ritz spaces (the drift diagnostic).

Usage: python scripts/exp_recycle.py [eLength=0.006] [ks=8,16,32]
Artifacts: bench_runs/round4_exp_recycle_<date>.jsonl
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Must precede the jax import (the axon plugin registers itself at import).
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import scipy.linalg as sla
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

CAP_DIR = "/tmp/exp_recycle_cap"
OUT = os.path.join(os.path.dirname(__file__), "..", "bench_runs",
                   f"round4_exp_recycle_{time.strftime('%Y-%m-%d')}.jsonl")


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


# ---------------------------------------------------------------------------
# Phase 1: capture the per-level systems from a production-trajectory run.
# ---------------------------------------------------------------------------

def _cap_path(elength, lv):
    return os.path.join(CAP_DIR, f"e{elength}_level{lv:02d}.npz")


def capture(elength, levels=10):
    os.makedirs(CAP_DIR, exist_ok=True)
    marker = os.path.join(CAP_DIR, f"done_{elength}_{levels}")
    if os.path.exists(marker):
        return
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow import pipeline
    from meshopticalflow_tpu.models import base as mbase

    cfg = FlowConfig(levels=levels, dtype="float64", use_host_cholesky=True,
                     subdivide_edge_length=elength)
    prob = pipeline.FlowProblem.from_texture_inputs(
        "/root/reference/Example/mesh.ply",
        ("/root/reference/Example/A.png", "/root/reference/Example/B.png"), cfg)

    state = {"level": 0}
    orig = mbase.update_optical_flow

    def wrapper(basis, coeffs, d_blocks, rhs_t, vf_smooth_weight, **kw):
        lv = state["level"]
        np.savez(_cap_path(elength, lv),
                 d_blocks=np.asarray(d_blocks), rhs_t=np.asarray(rhs_t),
                 v_weight=float(np.asarray(vf_smooth_weight)))
        state["level"] += 1
        return orig(basis, coeffs, d_blocks, rhs_t, vf_smooth_weight, **kw)

    pipeline.update_optical_flow = wrapper
    try:
        t0 = time.time()
        prob.run(verbose=False)
        emit({"capture_s": round(time.time() - t0, 1),
              "levels": state["level"]})
    finally:
        pipeline.update_optical_flow = orig
    open(marker, "w").write("ok")


# ---------------------------------------------------------------------------
# Phase 2: replay with / without deflation.
# ---------------------------------------------------------------------------

def ell_to_csr(cols, vals):
    n, w = cols.shape
    rows = np.repeat(np.arange(n), w)
    return sp.csr_matrix((vals.ravel(), (rows, np.asarray(cols).ravel())),
                         shape=(n, n))


def pcg_harvest(a_mv, b, precond, tol=1e-6, max_iters=400, harvest=0):
    """Baseline PCG; optionally harvests the preconditioned Lanczos basis
    (columns z_j / sqrt(r_j z_j)) plus the CG alpha/beta coefficients so the
    caller can form Ritz vectors of M^{-1}A without extra matvecs."""
    x = np.zeros_like(b)
    r = b.copy()
    z = precond(r)
    p = z.copy()
    rz = r @ z
    b2 = b @ b
    zs, alphas, betas = [], [], []
    for it in range(max_iters):
        if harvest and len(zs) < harvest:
            zs.append(z / np.sqrt(rz))
        ap = a_mv(p)
        alpha = rz / (p @ ap)
        alphas.append(alpha)
        x += alpha * p
        r -= alpha * ap
        if r @ r < tol * tol * b2:
            return x, it + 1, (zs, alphas, betas)
        z = precond(r)
        rz_new = r @ z
        betas.append(rz_new / rz)
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, max_iters, (zs, alphas, betas)


def ritz_vectors(zs, alphas, betas, k_small):
    """Smallest-k Ritz pairs of M^{-1}A from the CG tridiagonal."""
    m = len(zs)
    if m < 2:
        return None, None
    alphas = np.asarray(alphas[:m])
    betas = np.asarray(betas[:m])  # beta_j pairs with alpha_j, alpha_{j+1}
    diag = np.empty(m)
    diag[0] = 1.0 / alphas[0]
    for j in range(1, m):
        diag[j] = 1.0 / alphas[j] + betas[j - 1] / alphas[j - 1]
    off = np.array([np.sqrt(betas[j]) / alphas[j] for j in range(m - 1)])
    vals, vecs = sla.eigh_tridiagonal(diag, off)
    k = min(k_small, m)
    w = np.stack(zs, axis=1) @ vecs[:, :k]
    return w, vals[:k]


def deflated_pcg(a, precond, b, w, tol=1e-6, max_iters=400):
    """Saad-style deflated PCG: Galerkin start on span(W), every new
    preconditioned residual projected A-orthogonally to W."""
    aw = a @ w
    e = w.T @ aw
    ec = sla.cho_factor(e)

    def proj(v):
        return v - w @ sla.cho_solve(ec, aw.T @ v)

    x = w @ sla.cho_solve(ec, w.T @ b)
    r = b - a @ x
    b2 = b @ b
    if r @ r < tol * tol * b2:
        return x, 0
    z = precond(r)
    p = proj(z)
    rz = r @ z
    for it in range(max_iters):
        ap = a @ p
        alpha = rz / (p @ ap)
        x += alpha * p
        r -= alpha * ap
        if r @ r < tol * tol * b2:
            return x, it + 1
        z = precond(r)
        rz_new = r @ z
        p = proj(z) + (rz_new / rz) * p
        rz = rz_new
    return x, max_iters


def principal_angles(w0, w1):
    """cosines of the principal angles between two column spaces."""
    q0, _ = np.linalg.qr(w0)
    q1, _ = np.linalg.qr(w1)
    s = np.linalg.svd(q0.T @ q1, compute_uv=False)
    return s


def main():
    elength = float(sys.argv[1]) if len(sys.argv) > 1 else 0.006
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                           else (8, 16, 32))]
    levels = int(os.environ.get("EXP_LEVELS", "10"))

    t0 = time.time()
    capture(elength, levels)

    # Rebuild the problem once for the level-invariant pieces (basis cols,
    # coarse handles, prolongation) — deterministic from the mesh + config.
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem
    from meshopticalflow_tpu.models.base import build_flow_system, coarse_system_vals

    cfg = FlowConfig(levels=levels, dtype="float64", use_host_cholesky=True,
                     subdivide_edge_length=elength)
    prob = FlowProblem.from_texture_inputs(
        "/root/reference/Example/mesh.ply",
        ("/root/reference/Example/A.png", "/root/reference/Example/B.png"), cfg)
    basis = prob.arrays.basis
    cols = np.asarray(basis.ell_cols)
    cs = prob.coarse
    p01 = cs.p0
    c_cols = np.asarray(cs.coarse_dev.ell_cols)
    n = cols.shape[0]
    emit({"n": n, "setup_s": round(time.time() - t0, 1), "ks": ks,
          "elength": elength})

    kmax = max(ks)
    prev_w = None          # Ritz vectors harvested at level L-1
    prev_self_iters = None
    omega = 0.7
    for lv in range(levels):
        cap = np.load(_cap_path(elength, lv))
        d_blocks = jnp.asarray(cap["d_blocks"])
        rhs_t = jnp.asarray(cap["rhs_t"])
        lam = jnp.asarray(float(cap["v_weight"]), jnp.float64)
        sys_vals, _, rhs, _, scale = build_flow_system(basis, d_blocks,
                                                       rhs_t, lam)
        a = ell_to_csr(cols, np.asarray(sys_vals))
        rhs = np.asarray(rhs)
        c_vals = np.asarray(coarse_system_vals(cs.coarse_dev, d_blocks,
                                               jnp.asarray(scale), lam)[0])
        a1 = ell_to_csr(c_cols, c_vals)
        a1_lu = spla.splu((a1 + 1e-14 * sp.identity(a1.shape[0])).tocsc())

        d = a.diagonal().copy()
        d[d == 0] = 1.0
        inv_d = 1.0 / d

        def jac(r, z, nu):
            for _ in range(nu):
                z = z + omega * inv_d * (r - a @ z)
            return z

        def cycle(r):
            z = jac(r, omega * inv_d * r, 1)
            z = z + p01 @ a1_lu.solve(p01.T @ (r - a @ z))
            return jac(r, z, 2)

        a_mv = lambda v: a @ v
        row = {"level": lv}
        t = time.time()
        _, base_iters, (zs, alphas, betas) = pcg_harvest(
            a_mv, rhs, cycle, harvest=120)
        row["baseline"] = {"iters": base_iters, "s": round(time.time() - t, 1)}

        self_w, self_vals = ritz_vectors(zs, alphas, betas, kmax)
        if self_w is not None:
            row["ritz_small"] = [round(float(v), 6) for v in self_vals[:4]]

        for k in ks:
            if prev_w is not None and prev_w.shape[1] >= k:
                _, it = deflated_pcg(a, cycle, rhs, prev_w[:, :k])
                row[f"defl_prev_k{k}"] = it
            if self_w is not None and self_w.shape[1] >= k:
                _, it = deflated_pcg(a, cycle, rhs, self_w[:, :k])
                row[f"defl_self_k{k}"] = it
        if prev_w is not None and self_w is not None:
            kc = min(prev_w.shape[1], self_w.shape[1], 16)
            cosines = principal_angles(prev_w[:, :kc], self_w[:, :kc])
            row["prev_self_cos"] = [round(float(c), 4) for c in cosines[:6]]
        emit(row)
        prev_w = self_w

    emit({"total_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
