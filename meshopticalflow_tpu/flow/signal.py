"""Scalar-signal processing: screened-Poisson smoothing, DoG bands, log space.

Rebuilds FlowData::smoothSignal (OpticalFlow.cpp:330-349) and the
init-time comparison-signal construction (OpticalFlow.cpp:820-857):

  * smoothing solves (M + w K) x = M s per channel, both signals at once,
    as one batched Jacobi-PCG on a shared-pattern ELL matrix (the reference
    refactorizes an LLt Cholesky every level, LinearSolvers.h:294-335);
  * the difference-of-Gaussians band: x_hi = s - (M + w K)^-1 M s,
    variance-renormalized against the original signal;
  * optional log-space transform of the inputs (OpticalFlow.cpp:821).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp
from flax import struct

from meshopticalflow_tpu.geometry.mesh import HostMesh
from meshopticalflow_tpu.ops.assemble import scalar_mass_csr, scalar_stiffness_csr
from meshopticalflow_tpu.ops.ell import coo_slot_map, ell_from_scipy, ell_matvec
from meshopticalflow_tpu.solvers.cg import pcg_multi


class SmoothingOperators(struct.PyTreeNode):
    """Scalar mass/stiffness on one shared ELL pattern + lumped mass diag."""

    cols: jnp.ndarray        # (V, W) int32
    mass_vals: jnp.ndarray   # (V, W)
    stiff_vals: jnp.ndarray  # (V, W)
    diag_slot: jnp.ndarray   # (V,) int32
    lumped: jnp.ndarray      # (V,) barycentric vertex areas


def make_smoothing_operators(mesh: HostMesh, dtype=jnp.float32) -> SmoothingOperators:
    mass = scalar_mass_csr(mesh, lump=False)
    stiff = scalar_stiffness_csr(mesh)
    # Identical sparsity (both 1-ring element-assembled); share the pattern.
    union = (mass + stiff).tocsr()
    ell = ell_from_scipy(union)
    def fill(csr):
        coo = csr.tocoo()
        slots = coo_slot_map(ell.cols, coo.row, coo.col)
        vals = np.zeros(ell.cols.size, np.float64)
        np.add.at(vals, slots, coo.data)
        return vals.reshape(ell.cols.shape)
    lumped = np.zeros(mesh.n_vertices)
    np.add.at(lumped, mesh.triangles.ravel(), np.repeat(mesh.area / 3.0, 3))
    return SmoothingOperators(
        cols=jnp.asarray(ell.cols),
        mass_vals=jnp.asarray(fill(mass), dtype),
        stiff_vals=jnp.asarray(fill(stiff), dtype),
        diag_slot=jnp.asarray(ell.diag_slot),
        lumped=jnp.asarray(lumped, dtype),
    )


import jax


@jax.jit
def _smooth_system(ops: SmoothingOperators, signal: jnp.ndarray, weight):
    weight = jnp.asarray(weight, signal.dtype)
    sys_vals = ops.mass_vals + weight * ops.stiff_vals
    b = ell_matvec(ops.cols, ops.mass_vals, signal)
    diag = jnp.take_along_axis(sys_vals, ops.diag_slot[:, None], axis=1)[:, 0]
    return sys_vals, b, diag


def smooth_signal(ops: SmoothingOperators, signal: jnp.ndarray, weight,
                  tol: float = 1e-7, max_iters: int = 1000, chunk: int = 128):
    """(M + w K)^-1 M s for a (V, C) signal (FlowData::smoothSignal).

    Host-orchestrated chunked PCG (bounded device time per dispatch),
    warm-started from the signal itself.
    """
    from meshopticalflow_tpu.solvers.cg import ell_pcg

    sys_vals, b, diag = _smooth_system(ops, signal, weight)
    return ell_pcg(ops.cols, sys_vals, diag, b, x0=signal,
                   tol=tol, max_iters=max_iters, chunk=chunk)


def integral(ops: SmoothingOperators, x: jnp.ndarray) -> jnp.ndarray:
    """getIntegral (FEM.inl:2080-2097): lumped-mass weighted sum, per column."""
    return jnp.einsum("v,vc->c", ops.lumped, x)


@jax.jit
def _dog_renormalize(ops: SmoothingOperators, signal, smoothed):
    """Variance renormalization of the high-pass band (OpticalFlow.cpp:830-853)."""
    b = ell_matvec(ops.cols, ops.mass_vals, signal)
    old_avg = integral(ops, signal)
    old_var = jnp.einsum("vc,vc->c", signal, b) - old_avg * old_avg
    hi = signal - smoothed
    b_hi = ell_matvec(ops.cols, ops.mass_vals, hi)
    new_avg = integral(ops, hi)
    new_var = jnp.einsum("vc,vc->c", hi, b_hi) - new_avg * new_avg
    scale = jnp.sqrt(old_var / jnp.where(new_var > 0, new_var, 1.0))
    return (hi - new_avg[None, :]) * scale[None, :] + old_avg[None, :]


def dog_band(ops: SmoothingOperators, signal: jnp.ndarray, dog_smooth,
             tol: float = 1e-8, max_iters: int = 2000) -> jnp.ndarray:
    """Variance-renormalized high-pass band (OpticalFlow.cpp:822-854).

    signal: (V, C); returns the renormalized DoG band (V, C).
    """
    smoothed, _ = smooth_signal(ops, signal, dog_smooth, tol, max_iters)
    return _dog_renormalize(ops, signal, smoothed)


def log_space(signal: jnp.ndarray) -> jnp.ndarray:
    """log-space remap of a 0..255 signal (OpticalFlow.cpp:821)."""
    return jnp.log(jnp.maximum(signal, 1.0)) * (255.0 / np.log(255.0))
