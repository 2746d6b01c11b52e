"""Double-float residuals (solvers/df32.py) and device-resident refinement.

Oracle: numpy float64. The compensated f32 residual must track the f64
residual to ~1e-12 relative even deep into cancellation territory — that is
the property that lets solvers/refine.py stay on device (VERDICT r2 next #5).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from meshopticalflow_tpu.solvers.df32 import (df32_mode, df32_probe,
                                              df_update, ell_residual_df,
                                              two_sum)


def _random_ell(n, w, rng, spd_shift=True):
    cols = rng.integers(0, n, size=(n, w)).astype(np.int32)
    cols[:, 0] = np.arange(n)  # keep a diagonal slot
    vals = rng.normal(size=(n, w)).astype(np.float32)
    if spd_shift:
        vals[:, 0] = np.abs(vals[:, 0]) + w  # diagonally dominant
    return cols, vals


def _ell_to_csr(cols, vals):
    n, w = cols.shape
    rows = np.repeat(np.arange(n), w)
    return sp.csr_matrix((vals.astype(np.float64).ravel(),
                          (rows, cols.ravel())), shape=(n, n))


def test_probe_passes_on_this_backend():
    import jax
    assert df32_probe(jax.default_backend()) is True
    assert df32_mode(jax.default_backend()) in ("fma", "dekker")


def test_two_sum_exact():
    a = jnp.float32(1.0)
    b = jnp.float32(2.0 ** -30)
    s, e = two_sum(a, b)
    assert float(s) == 1.0 and float(e) == 2.0 ** -30


def test_ell_residual_df_vs_f64():
    """Residual accuracy with heavy cancellation: x near A^{-1} b."""
    rng = np.random.default_rng(1)
    n, w = 4096, 9
    cols, vals = _random_ell(n, w, rng)
    a = _ell_to_csr(cols, vals)
    x64 = rng.normal(size=n)
    b64 = a @ x64  # so the true residual at x64 is 0
    # Perturb x at 1e-9 — the residual is ~1e-8 |b|, far below f32 eps*|b|.
    x64p = x64 * (1 + 1e-9 * rng.normal(size=n))
    x_hi = x64p.astype(np.float32)
    x_lo = (x64p - x_hi.astype(np.float64)).astype(np.float32)
    b32 = b64.astype(np.float32)

    r_hi, r_lo, stats = ell_residual_df(jnp.asarray(cols), jnp.asarray(vals),
                                        jnp.asarray(x_hi), jnp.asarray(x_lo),
                                        jnp.asarray(b32))
    # f64 oracle residual of the SAME f32-representable inputs
    x_exact = x_hi.astype(np.float64) + x_lo.astype(np.float64)
    r64 = b32.astype(np.float64) - a @ x_exact
    r_df = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    scale = np.linalg.norm(b64)
    assert np.linalg.norm(r_df - r64) / scale < 5e-13
    # the plain f32 residual would be ~1e-7 relative garbage here
    r32 = np.asarray(b32 - np.einsum("nw,nw->n", vals,
                                     x_hi[cols]).astype(np.float32), np.float64)
    assert np.linalg.norm(r32 - r64) / scale > 1e-9
    # fetched stats match the residual
    assert np.isclose(float(stats[0]), float(np.vdot(r_df, r_df)), rtol=1e-3)


def test_ell_residual_df_scaled_vs_f64():
    """The fused scaled residual keeps df32-grade compensation in its own
    (larger) fusion context: its stats must track the f64 oracle residual
    even though |r| is ~1e-8 |b| (a broken compensation would report 1e-7 |b|
    f32 noise instead), and r_scaled * scale must match the oracle residual
    to f32 eps of |r| (the precision the inner solve consumes)."""
    from meshopticalflow_tpu.solvers.df32 import ell_residual_df_scaled

    rng = np.random.default_rng(3)
    n, w = 1024, 7
    cols, vals = _random_ell(n, w, rng)
    a = _ell_to_csr(cols, vals)
    x64 = rng.normal(size=n)
    b32 = (a @ x64).astype(np.float32)
    x64p = x64 * (1 + 1e-9 * rng.normal(size=n))
    x_hi = x64p.astype(np.float32)
    x_lo = (x64p - x_hi.astype(np.float64)).astype(np.float32)
    args = (jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(x_hi),
            jnp.asarray(x_lo), jnp.asarray(b32))
    r_scaled, stats = ell_residual_df_scaled(*args)
    x_exact = x_hi.astype(np.float64) + x_lo.astype(np.float64)
    r64 = b32.astype(np.float64) - a @ x_exact
    stats_h = np.asarray(stats, np.float64)
    assert np.isclose(np.sqrt(stats_h[0]), np.linalg.norm(r64), rtol=1e-4)
    assert np.isclose(stats_h[1], np.max(np.abs(r64)), rtol=1e-4)
    r_fused = np.asarray(r_scaled, np.float64) * stats_h[1]
    r_norm = np.linalg.norm(r64)
    assert np.linalg.norm(r_fused - r64) / r_norm < 1e-5
    # Sanity: |r| really is in deep-cancellation territory for plain f32.
    assert r_norm < 1e-6 * np.linalg.norm(b32)


def test_df_update_accumulates_beyond_f32():
    x_hi = jnp.zeros(4, jnp.float32)
    x_lo = jnp.zeros(4, jnp.float32)
    for _ in range(3):
        x_hi, x_lo = df_update(x_hi, x_lo, jnp.full(4, 1.0, jnp.float32),
                               jnp.float32(1.0))
        x_hi, x_lo = df_update(x_hi, x_lo, jnp.full(4, 2.0 ** -30, jnp.float32),
                               jnp.float32(1.0))
    total = np.asarray(x_hi, np.float64) + np.asarray(x_lo, np.float64)
    assert np.allclose(total, 3.0 * (1 + 2.0 ** -30), rtol=0, atol=1e-12)


@pytest.mark.parametrize("residuals", ["device", "host"])
def test_refined_solve_device_matches_host(residuals):
    """ell_solve_refined reaches the same f64-residual quality either way."""
    from meshopticalflow_tpu.solvers.refine import ell_solve_refined

    rng = np.random.default_rng(2)
    n, w = 2048, 7
    cols, vals = _random_ell(n, w, rng)
    a = _ell_to_csr(cols, vals)
    a = (a + a.T) * 0.5  # symmetrize for CG
    # rebuild symmetric ELL
    a_ell = a.tolil()
    w2 = max(len(r) for r in a_ell.rows)
    cols2 = np.zeros((n, w2), np.int32)
    vals2 = np.zeros((n, w2), np.float32)
    for i, (rc, rv) in enumerate(zip(a_ell.rows, a_ell.data)):
        cols2[i, :len(rc)] = rc
        vals2[i, :len(rv)] = rv
        if len(rc) < w2:
            cols2[i, len(rc):] = rc[0] if rc else 0
    diag = np.asarray(a.diagonal(), np.float32)
    b = rng.normal(size=n).astype(np.float32)
    x, stats = ell_solve_refined(jnp.asarray(cols2), jnp.asarray(vals2),
                                 jnp.asarray(diag), jnp.asarray(b),
                                 tol=1e-11, residuals=residuals)
    a64 = _ell_to_csr(cols2, vals2)
    r = b.astype(np.float64) - a64 @ np.asarray(x, np.float64)
    rel = np.linalg.norm(r) / np.linalg.norm(b)
    # x is returned in f32, so the verifiable bound is f32 representation
    # error of the exact solution, not the internal df32 residual.
    assert rel < 5e-7
    assert float(stats.rel_residual) < 1e-10 or residuals == "host"
