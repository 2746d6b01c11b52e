"""Three-level multigrid PCG, fully on device.

Levels: fine ELL system -> Galerkin coarse ELL system (the pre-subdivision
mesh) -> dense patch-aggregated coarsest system solved by Cholesky on the
MXU (models/patches.py). Unlike solvers/twolevel.py there is NO host round
trip inside the iteration — the whole PCG loop runs in chunked device
dispatches, which removes the ~0.15-0.3 s/iteration tunnel latency that
dominated the two-level solver.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from meshopticalflow_tpu.ops.bsr import BlockEllDevice
from meshopticalflow_tpu.ops.ell import ell_matvec
from meshopticalflow_tpu.solvers.cg import CGStats
from meshopticalflow_tpu.solvers.twolevel import _dscale, _dots, _prolong, _restrict


def _mv(op, x):
    """Matvec for either fine-operator representation.

    ``op`` is a pytree jit argument: a BlockEllDevice (RCM-tiled, ~4.6x
    faster on TPU, see ops/bsr.py) or a plain ``(cols, vals)`` padded-ELL
    pair. The branch is static at trace time.
    """
    if isinstance(op, BlockEllDevice):
        return op.matvec(x)
    cols, vals = op
    return ell_matvec(cols, vals, x)


def _jacobi(op, inv_diag, r, z, omega, nu):
    """nu damped-Jacobi sweeps refining z toward A^-1 r."""
    for _ in range(nu):
        z = z + omega * _dscale(inv_diag, r - _mv(op, z))
    return z


def _cycle(fine, c1, chol2, p01, p12, r, omega, nu):
    f_op, f_inv = fine
    c_op, c_inv = c1
    p01_idx, p01_wt, n1 = p01
    p12_idx, p12_wt, n2 = p12
    z = _jacobi(f_op, f_inv, r, jnp.zeros_like(r) + omega * _dscale(f_inv, r),
                omega, nu - 1)
    r1 = _restrict(p01_idx, p01_wt, r - _mv(f_op, z), n1)
    z1 = _jacobi(c_op, c_inv, r1,
                 jnp.zeros_like(r1) + omega * _dscale(c_inv, r1), omega, nu - 1)
    r2 = _restrict(p12_idx, p12_wt, r1 - _mv(c_op, z1), n2)
    e2 = jax.scipy.linalg.cho_solve((chol2, True),
                                    r2 if r2.ndim == 2 else r2[:, None])
    e2 = e2 if r2.ndim == 2 else e2[:, 0]
    z1 = z1 + _prolong(p12_idx, p12_wt, e2)
    z1 = _jacobi(c_op, c_inv, r1, z1, omega, nu)
    z = z + _prolong(p01_idx, p01_wt, z1)
    return _jacobi(f_op, f_inv, r, z, omega, nu)


@functools.partial(jax.jit, static_argnames=("nu", "n1", "n2", "iters"))
def _pcg_chunk(f_op, f_inv, c_op, c_inv, chol2,
               p01_idx, p01_wt, p12_idx, p12_wt, omega,
               x, r, p, rz, nu: int, n1: int, n2: int, iters: int):
    fine = (f_op, f_inv)
    c1 = (c_op, c_inv)
    p01 = (p01_idx, p01_wt, n1)
    p12 = (p12_idx, p12_wt, n2)
    multi = r.ndim == 2

    def body(_, s):
        x, r, p, rz_old = s
        z = _cycle(fine, c1, chol2, p01, p12, r, omega, nu)
        rz = _dots(r, z)
        beta = jnp.where(rz_old != 0, rz / jnp.where(rz_old != 0, rz_old, 1.0), 0.0)
        p = z + (beta[None, :] if multi else beta) * p
        ap = _mv(f_op, p)
        pap = _dots(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        a_ = alpha[None, :] if multi else alpha
        return (x + a_ * p, r - a_ * ap, p, rz)

    x, r, p, rz = lax.fori_loop(0, iters, body, (x, r, p, rz))
    r2 = jnp.max(_dots(r, r)) if multi else _dots(r, r)
    return x, r, p, rz, r2


class ThreeLevelSolver:
    """Fine ELL + coarse ELL + dense coarsest; chunked device-only PCG."""

    def __init__(self, fine_cols, fine_vals, fine_diag,
                 c1_cols, c1_vals, p01_idx, p01_wt,
                 a2_dense, p12_idx, p12_wt,
                 omega: float = 0.7, nu: int = 2,
                 fine_bsr: BlockEllDevice = None,
                 c1_bsr: BlockEllDevice = None):
        dtype = (fine_bsr.vals if fine_bsr is not None else fine_vals).dtype
        self.f_op = fine_bsr if fine_bsr is not None else (fine_cols, fine_vals)
        self.f_inv = jnp.where(fine_diag != 0,
                               1.0 / jnp.where(fine_diag != 0, fine_diag, 1.0), 0.0)
        n1 = c1_cols.shape[0]
        c_diag = jnp.take_along_axis(
            c1_vals, jnp.argmax(c1_cols == jnp.arange(n1)[:, None], axis=1)[:, None],
            axis=1)[:, 0]
        self.c1 = (c1_bsr if c1_bsr is not None else (c1_cols, c1_vals),
                   jnp.where(c_diag != 0, 1.0 / jnp.where(c_diag != 0, c_diag, 1.0), 0.0))
        self.p01 = (p01_idx, p01_wt, n1)
        n2 = a2_dense.shape[0]
        self.p12 = (p12_idx, p12_wt, n2)
        # Tiny Tikhonov guard keeps semi-definite coarsest systems factorable.
        eps = 1e-7 * jnp.max(jnp.abs(jnp.diagonal(a2_dense)))
        self.chol2 = jnp.linalg.cholesky(a2_dense + eps * jnp.eye(n2, dtype=dtype))
        self.omega = jnp.asarray(omega, dtype)
        self.nu = nu

    def solve(self, b, x0: Optional[jnp.ndarray] = None, tol: float = 1e-7,
              max_iters: int = 200, chunk: int = 8,
              b_norm2: Optional[float] = None):
        multi = b.ndim == 2
        if b_norm2 is None:
            b_norm2 = float(jnp.max(_dots(b, b))) if multi \
                else float(jnp.vdot(b, b))
        if b_norm2 == 0:
            return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                              jnp.asarray(0.0, b.dtype))
        x = jnp.zeros_like(b) if x0 is None else x0
        r = b if x0 is None else b - _mv(self.f_op, x)
        p = jnp.zeros_like(b)
        rz = jnp.zeros(b.shape[1], b.dtype) if multi else jnp.asarray(0.0, b.dtype)
        threshold = (tol ** 2) * b_norm2
        done = 0
        r2 = b_norm2
        while done < max_iters and r2 > threshold:
            iters = min(chunk, max_iters - done)
            x, r, p, rz, r2_dev = _pcg_chunk(
                self.f_op, self.f_inv,
                self.c1[0], self.c1[1], self.chol2,
                self.p01[0], self.p01[1], self.p12[0], self.p12[1], self.omega,
                x, r, p, rz, self.nu, self.p01[2], self.p12[2], iters)
            r2 = float(r2_dev)
            done += iters
        rel = float(np.sqrt(max(r2, 0.0) / b_norm2))
        return x, CGStats(jnp.asarray(done, jnp.int32), jnp.asarray(rel, b.dtype))
