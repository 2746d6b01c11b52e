"""Fully-jittable level step with fixed solver iteration counts.

The production path (flow.pipeline) chunks its CG solves across dispatches
for bounded device time; this variant instead runs fixed iteration counts so
the WHOLE UpdateFlow level is one pure jittable function — the unit that
pjit/shard_map partitions across a device mesh, and the compile-check entry
point for the driver.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from meshopticalflow_tpu.kernels.advect import resample_signal_pair
from meshopticalflow_tpu.models.base import (
    BasisDevice, data_term_ell_vals, prolong, reduce_rhs)
from meshopticalflow_tpu.ops.dataterm import data_term_blocks
from meshopticalflow_tpu.ops.ell import ell_matvec
from meshopticalflow_tpu.solvers.cg import pcg, pcg_multi


def flow_level_fixed(
    arrays,                      # flow.pipeline.ProblemArrays
    coeffs: jnp.ndarray,
    tfield: jnp.ndarray,
    s_weight,
    v_weight,
    smooth_iters: int = 64,
    flow_iters: int = 128,
    min_step: float = 1e-2,
    max_steps: int = 512,
    axis_name=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One UpdateFlow level (OpticalFlow.cpp:423-474) as a pure function.

    Returns (new_coeffs, new_tfield, alignment_error).
    """
    ops = arrays.smooth_ops
    basis = arrays.basis
    c = arrays.signals.shape[1] // 2
    s_weight = jnp.asarray(s_weight, arrays.signals.dtype)
    v_weight = jnp.asarray(v_weight, arrays.signals.dtype)

    # Signal smoothing (M + wK)^-1 M s.
    sys_vals = ops.mass_vals + s_weight * ops.stiff_vals
    b = ell_matvec(ops.cols, ops.mass_vals, arrays.signals)
    diag = jnp.take_along_axis(sys_vals, ops.diag_slot[:, None], axis=1)[:, 0]
    smoothed, _ = pcg_multi(lambda v: ell_matvec(ops.cols, sys_vals, v), b, diag,
                            x0=arrays.signals, tol=1e-30, max_iters=smooth_iters,
                            axis_name=axis_name)

    # Advect +-1/2 and build the data term.
    resampled = resample_signal_pair(arrays.tm, tfield, smoothed, -0.5, 0.5,
                                     min_step, max_steps)
    res0, res1 = resampled[:, :c], resampled[:, c:]
    d_blocks, rhs_t = data_term_blocks(arrays.tm.triangles, arrays.area, res0, res1)

    # Regularized Gauss-Newton step.
    n, w = basis.ell_cols.shape
    dt_flat = data_term_ell_vals(basis, d_blocks)
    frob = jnp.sqrt(jnp.sum(dt_flat * dt_flat))
    scale = jnp.where(frob > 0, 1.0 / frob, 0.0)
    dt_vals = (dt_flat * scale).reshape(n, w)
    fsys = dt_vals + v_weight * basis.s_vals
    rhs = reduce_rhs(basis, rhs_t) * scale
    fdiag = jnp.take_along_axis(fsys, basis.diag_slot[:, None], axis=1)[:, 0]
    x, _ = pcg(lambda v: ell_matvec(basis.ell_cols, fsys, v), rhs, fdiag,
               tol=1e-30, max_iters=flow_iters, axis_name=axis_name)
    dx = ell_matvec(basis.ell_cols, dt_vals, x)
    denom = jnp.vdot(x, dx)
    step = jnp.where(denom != 0, jnp.vdot(x, rhs) / jnp.where(denom != 0, denom, 1.0), 0.0)
    new_coeffs = coeffs + step * x
    new_tfield = prolong(basis, new_coeffs)

    diff = res1 - res0
    mdiff = ell_matvec(ops.cols, ops.mass_vals, diff)
    align_err = jnp.sum(diff * mdiff)
    return new_coeffs, new_tfield, align_err
