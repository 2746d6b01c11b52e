"""Jacobi-preconditioned conjugate gradients, matrix-free, batched multi-rhs.

This replaces the reference's direct solvers (EigenCholeskySolver{LLt,LDLt},
Misha/LinearSolvers.h:249-391): on TPU an iterative method keeps everything
on-device with static shapes, and the per-level "update() + solve()"
amortization trick becomes unnecessary — the system is rebuilt as an ELL
values array each level for free.

All rhs columns iterate together with per-column alpha/beta; iteration stops
when every column's residual passes the relative tolerance (or at
``max_iters``). Dot products reduce over the row axis only, so the solver is
shard_map-compatible: pass ``axis_name`` to psum partial dots across a
device mesh.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class CGStats(NamedTuple):
    iterations: jnp.ndarray   # int32
    rel_residual: jnp.ndarray  # worst column relative residual


def _psum(x, axis_name):
    return x if axis_name is None else lax.psum(x, axis_name)


def pcg_multi(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,                 # (N, C)
    diag: jnp.ndarray,              # (N,)
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-7,
    max_iters: int = 1000,
    axis_name: Optional[str] = None,
):
    """Solve A x = b for SPD A with C right-hand sides simultaneously."""
    dtype = b.dtype
    inv_diag = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    x = jnp.zeros_like(b) if x0 is None else x0

    def dots(u, v):
        return _psum(jnp.einsum("nc,nc->c", u, v), axis_name)

    r = b - matvec(x) if x0 is not None else b
    z = inv_diag[:, None] * r
    p = z
    rz = dots(r, z)
    b_norm2 = dots(b, b)
    b_norm2 = jnp.where(b_norm2 > 0, b_norm2, 1.0)
    tol2 = jnp.asarray(tol, dtype) ** 2 * b_norm2

    def cond(state):
        x, r, z, p, rz, it = state
        r2 = dots(r, r)
        return jnp.logical_and(it < max_iters, jnp.any(r2 > tol2))

    def body(state):
        x, r, z, p, rz, it = state
        ap = matvec(p)
        pap = dots(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        z = inv_diag[:, None] * r
        rz_new = dots(r, z)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[None, :] * p
        return (x, r, z, p, rz_new, it + 1)

    state = (x, r, z, p, rz, jnp.asarray(0, jnp.int32))
    x, r, _, _, _, it = lax.while_loop(cond, body, state)
    rel = jnp.sqrt(jnp.max(dots(r, r) / b_norm2))
    return x, CGStats(it, rel)


def pcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,                 # (N,)
    diag: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    tol: float = 1e-7,
    max_iters: int = 1000,
    axis_name: Optional[str] = None,
):
    """Single-rhs wrapper around pcg_multi."""
    mv = lambda v: matvec(v[:, 0])[:, None]
    x0c = None if x0 is None else x0[:, None]
    x, stats = pcg_multi(mv, b[:, None], diag, x0c, tol, max_iters, axis_name)
    return x[:, 0], stats
