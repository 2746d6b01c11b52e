"""Two-level (geometric multigrid) preconditioned CG for the flow systems.

Preconditioner M^-1 = symmetric two-grid cycle:
    pre-smooth   nu damped-Jacobi sweeps on the fine ELL system
    coarse solve A0^-1 on the Galerkin coarse space (models.coarse),
                 factorized once per level on host (scipy splu — the coarse
                 grid is the original pre-subdivision mesh, ~5-10x smaller)
    post-smooth  nu sweeps

With fixed sweep counts and an exact coarse solve the preconditioner is a
fixed SPD operator, so plain PCG applies. This replaces hundreds-to-
thousands of Jacobi-CG iterations per level with O(10-30) outer iterations,
and kills exactly the near-null smooth error modes that made plain f32 CG
solutions diverge from the reference's direct solves.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp

from meshopticalflow_tpu.ops.ell import ell_matvec
from meshopticalflow_tpu.solvers.cg import CGStats


@functools.partial(jax.jit, static_argnames=("nu", "n_coarse"))
def _pre_cycle(cols, vals, inv_diag, p0_idx, p0_wt, r, omega, nu: int, n_coarse: int):
    """nu damped-Jacobi sweeps from zero + restricted residual."""
    z = omega * inv_diag * r
    for _ in range(nu - 1):
        z = z + omega * inv_diag * (r - ell_matvec(cols, vals, z))
    res = r - ell_matvec(cols, vals, z)
    rc = jax.ops.segment_sum((p0_wt * res[:, None]).ravel(), p0_idx.ravel(),
                             num_segments=n_coarse)
    return z, rc


@functools.partial(jax.jit, static_argnames=("nu",))
def _post_cycle(cols, vals, inv_diag, p0_idx, p0_wt, r, z, ec, omega, nu: int):
    z = z + jnp.sum(p0_wt * ec[p0_idx], axis=1)
    for _ in range(nu):
        z = z + omega * inv_diag * (r - ell_matvec(cols, vals, z))
    return z


@jax.jit
def _cg_advance(cols, vals, x, r, p, rz):
    """One CG x/r update; returns (x', r', Ap-free state)."""
    ap = ell_matvec(cols, vals, p)
    pap = jnp.vdot(p, ap)
    alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
    return x + alpha * p, r - alpha * ap


@jax.jit
def _cg_direction(z, r, p, rz_old):
    rz = jnp.vdot(r, z)
    beta = jnp.where(rz_old != 0, rz / jnp.where(rz_old != 0, rz_old, 1.0), 0.0)
    return z + beta * p, rz, jnp.vdot(r, r)


class TwoLevelSolver:
    """Per-level solver: factor the coarse system once, then PCG."""

    def __init__(self, fine_cols, fine_vals, fine_diag,
                 coarse_cols, coarse_vals, p0_idx, p0_wt,
                 omega: float = 0.7, nu: int = 2):
        self.cols = fine_cols
        self.vals = fine_vals
        dtype = fine_vals.dtype
        self.inv_diag = jnp.where(fine_diag != 0,
                                  1.0 / jnp.where(fine_diag != 0, fine_diag, 1.0), 0.0)
        self.p0_idx = p0_idx
        self.p0_wt = p0_wt
        self.omega = jnp.asarray(omega, dtype)
        self.nu = nu
        n_c = coarse_cols.shape[0]
        self.n_coarse = n_c
        cc = np.asarray(coarse_cols)
        w0 = cc.shape[1]
        a0 = sp.csc_matrix((np.asarray(coarse_vals, np.float64).ravel(),
                            (np.repeat(np.arange(n_c), w0), cc.ravel())),
                           shape=(n_c, n_c))
        # Tiny Tikhonov guard for semi-definite coarse systems (e.g. the
        # conformal constants nullspace) — scaled to the diagonal magnitude.
        eps = 1e-12 * float(np.abs(a0.diagonal()).max() or 1.0)
        self.coarse_lu = spla.splu(a0 + eps * sp.identity(n_c, format="csc"))
        self.dtype = dtype

    def _apply_precond(self, r):
        z, rc = _pre_cycle(self.cols, self.vals, self.inv_diag, self.p0_idx,
                           self.p0_wt, r, self.omega, self.nu, self.n_coarse)
        ec = self.coarse_lu.solve(np.asarray(rc, np.float64))
        ec = jnp.asarray(ec, self.dtype)
        return _post_cycle(self.cols, self.vals, self.inv_diag, self.p0_idx,
                           self.p0_wt, r, z, ec, self.omega, self.nu)

    def solve(self, b, x0: Optional[jnp.ndarray] = None, tol: float = 1e-7,
              max_iters: int = 100):
        b_norm2 = float(jnp.vdot(b, b))
        if b_norm2 == 0:
            return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                              jnp.asarray(0.0, b.dtype))
        x = jnp.zeros_like(b) if x0 is None else x0
        r = b if x0 is None else b - ell_matvec(self.cols, self.vals, x)
        z = self._apply_precond(r)
        p = z
        rz = jnp.vdot(r, z)
        threshold = (tol ** 2) * b_norm2
        it = 0
        r2 = float(jnp.vdot(r, r))
        while it < max_iters and r2 > threshold:
            x, r = _cg_advance(self.cols, self.vals, x, r, p, rz)
            z = self._apply_precond(r)
            p, rz, r2_dev = _cg_direction(z, r, p, rz)
            r2 = float(r2_dev)
            it += 1
        rel = float(np.sqrt(max(r2, 0.0) / b_norm2))
        return x, CGStats(jnp.asarray(it, jnp.int32), jnp.asarray(rel, b.dtype))
