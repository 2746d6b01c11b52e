"""Truncated-band incomplete Cholesky as the flow preconditioner (CPU, scipy).

The EXACT fine factorization is out (RCM semiband 4369 -> 6 GB band), but a
TRUNCATED band (drop entries beyond bw after RCM) still factors cheaply and
costs only 2*n*bw floats of traffic per application — the question is how
many PCG iterations it buys vs the shipped nu=2-Jacobi + exact-c1 2-level
cycle (~59 iters with f64 exact pieces; 96 on-device in f32). Measures, on
the REAL level-0 demo flow system at a configurable subdivision:

  jacobi+c1    the shipped cycle's f64 mirror (baseline)
  icband       truncated-band IC alone, symmetric application
  icband+c1    IC as the smoother around the exact c1 coarse correction

Usage: python scripts/exp_ic.py [eLength=0.02] [bw1,bw2,...=256,512,1024]
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

from exp_mg import build_system, ell_to_csr, pcg  # noqa: E402


def truncated_band_factor(a_csr, bw):
    """RCM-order a, keep |i-j| <= bw, scipy cholesky_banded with escalating
    diagonal shift. Returns (solve(b)->x, perm, used_shift) or None."""
    import scipy.linalg as sla
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    perm = np.asarray(reverse_cuthill_mckee(a_csr, symmetric_mode=True))
    ap = a_csr[perm][:, perm].tocoo()
    keep = np.abs(ap.row - ap.col) <= bw
    dropped = 1.0 - keep.mean()
    n = a_csr.shape[0]
    # lower-banded storage for cholesky_banded(lower=True): ab[i, j] = A[j+i, j]
    ab = np.zeros((bw + 1, n))
    r, c, v = ap.row[keep], ap.col[keep], ap.data[keep]
    lo = r >= c
    ab[r[lo] - c[lo], c[lo]] = v[lo]
    dmax = float(np.abs(ap.data).max())
    for rel in (0.0, 1e-10, 1e-8, 1e-6, 1e-4, 1e-2):
        try:
            abf = ab.copy()
            abf[0] += rel * dmax
            cb = sla.cholesky_banded(abf, lower=True)
            inv_perm = np.empty(n, np.int64)
            inv_perm[perm] = np.arange(n)

            def solve(b, cb=cb):
                xp = sla.cho_solve_banded((cb, True), b[perm])
                return xp[inv_perm]

            return solve, dropped, rel
        except np.linalg.LinAlgError:
            continue
    return None, dropped, None


def main():
    elength = float(sys.argv[1]) if len(sys.argv) > 1 else 0.02
    bws = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                            else ("256", "512", "1024"))]
    t0 = time.time()
    prob, d_blocks, sys_vals, rhs, scale, lam = build_system(elength)
    basis = prob.arrays.basis
    cols = np.asarray(basis.ell_cols)
    a = ell_to_csr(cols, sys_vals)
    n = a.shape[0]
    print(json.dumps({"n": n, "build_s": round(time.time() - t0, 1)}),
          flush=True)

    d = a.diagonal().copy(); d[d == 0] = 1.0
    inv_d = 1.0 / d

    # exact c1 coarse pieces (mirrors the device's banded-exact c1)
    from meshopticalflow_tpu.models.base import coarse_system_vals
    cs = prob.coarse
    c_vals = np.asarray(coarse_system_vals(cs.coarse_dev, d_blocks,
                                           jnp.asarray(scale),
                                           jnp.asarray(lam))[0])
    a1 = ell_to_csr(np.asarray(cs.coarse_dev.ell_cols), c_vals)
    p01 = cs.p0
    import scipy.sparse.linalg as spla
    a1lu = spla.splu(a1.tocsc())

    omega = 0.7

    def cycle_jac_c1(r, nu=2):
        z = omega * inv_d * r
        for _ in range(nu - 1):
            z = z + omega * inv_d * (r - a @ z)
        r1 = p01.T @ (r - a @ z)
        z = z + p01 @ a1lu.solve(r1)
        for _ in range(nu):
            z = z + omega * inv_d * (r - a @ z)
        return z

    x, iters = pcg(lambda v: a @ v, rhs, lambda r: cycle_jac_c1(r),
                   tol=1e-6, max_iters=400)
    print(json.dumps({"variant": "jacobi+c1 (shipped mirror)",
                      "iters": iters}), flush=True)

    for bw in bws:
        t0 = time.time()
        solve, dropped, shift = truncated_band_factor(a, bw)
        if solve is None:
            print(json.dumps({"variant": f"icband bw={bw}",
                              "factor": "breakdown",
                              "dropped_frac": round(dropped, 4)}), flush=True)
            continue
        fac_s = time.time() - t0
        x, iters = pcg(lambda v: a @ v, rhs, solve, tol=1e-6, max_iters=400)
        print(json.dumps({"variant": f"icband bw={bw}", "iters": iters,
                          "dropped_frac": round(dropped, 4),
                          "shift_rel": shift,
                          "factor_s": round(fac_s, 1),
                          "gb_per_apply_f32": round(2 * n * bw * 4 / 1e9, 2)}),
              flush=True)

        def cycle_ic_c1(r, solve=solve):
            z = solve(r)
            r1 = p01.T @ (r - a @ z)
            z = z + p01 @ a1lu.solve(r1)
            z = z + solve(r - a @ z)
            return z

        x, iters = pcg(lambda v: a @ v, rhs, cycle_ic_c1,
                       tol=1e-6, max_iters=400)
        print(json.dumps({"variant": f"icband+c1 bw={bw}", "iters": iters}),
              flush=True)


if __name__ == "__main__":
    main()
