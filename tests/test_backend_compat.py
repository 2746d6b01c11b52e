"""Probe for the axon-backend slice+concat miscompilation and the safe helper."""

import numpy as np

import jax
import jax.numpy as jnp

from meshopticalflow_tpu.utils.compat import concat_columns


def test_concat_columns_matches_numpy(rng):
    t = 4096
    s = jnp.asarray(rng.normal(size=(2 * t, 12)), jnp.float32)
    ref = np.concatenate([np.asarray(s)[:t, :6], np.asarray(s)[t:, 6:]], axis=1)
    got = np.asarray(jax.jit(lambda x: concat_columns(x[:t, :6], x[t:, 6:]))(s))
    np.testing.assert_array_equal(got, ref)
    # three parts
    ref3 = np.concatenate([np.asarray(s)[:t, :2], np.asarray(s)[:t, 2:5],
                           np.asarray(s)[:t, 5:]], axis=1)
    got3 = np.asarray(jax.jit(
        lambda x: concat_columns(x[:t, :2], x[:t, 2:5], x[:t, 5:]))(s))
    np.testing.assert_array_equal(got3, np.asarray(s)[:t])


def test_fetch_band_parallel_matches_asarray(rng, monkeypatch):
    from meshopticalflow_tpu.utils import fetch as F

    arr = jnp.asarray(rng.integers(0, 255, (512, 700, 3)), jnp.uint8)
    ref = np.asarray(arr)
    for parts in (1, 2, 4, 7):
        np.testing.assert_array_equal(F.fetch(arr, parts=parts), ref)
    # env-driven default
    monkeypatch.setenv("MESHFLOW_FETCH_PARTS", "3")
    assert F.fetch_parts() == 3
    np.testing.assert_array_equal(F.fetch(arr), ref)
    monkeypatch.setenv("MESHFLOW_FETCH_PARTS", "junk")
    assert F.fetch_parts() == 1
    # small / scalar arrays fall back to one fetch
    np.testing.assert_array_equal(F.fetch(jnp.arange(10), parts=4),
                                  np.arange(10))
    assert F.fetch(jnp.asarray(1.5), parts=4) == 1.5


def test_stable_platform_version_strips_build_stamp():
    """The persistent-cache key must survive an axon service redeploy: the
    sanitizer drops the per-build 'Built on ...' line and keeps every
    compatibility-bearing line (utils/jitcache.py; round-4's 61-entry
    rewrite on a warm cache dir)."""
    from meshopticalflow_tpu.utils.jitcache import _stable_platform_version

    v = ("PJRT C API\n"
         "axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49\n"
         "TFRT TPU v5 lite\n"
         "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709")
    s = _stable_platform_version(v)
    assert "Built on" not in s
    assert "compat c49" in s and "TFRT TPU v5 lite" in s
    # A redeploy (new stamp, same compat) maps to the SAME key material...
    assert _stable_platform_version(
        v.replace("Nov 12 2025", "Dec 01 2025").replace("831091709", "9")) == s
    # ...while a compat bump still rotates it.
    assert _stable_platform_version(v.replace("compat c49", "compat c50")) != s
    # Non-axon strings (no build stamp) pass through unchanged.
    assert _stable_platform_version("cpu v1") == "cpu v1"


def test_resolve_flow_backend_f64_never_pallas():
    """float64 problems must take the XLA SpMV path: Mosaic has no f64
    lowering, while XLA:TPU executes f64 natively (reference default is
    double precision, OpticalFlow.cpp:1113-1115)."""
    from meshopticalflow_tpu.kernels.pallas_spmv import resolve_flow_backend

    assert resolve_flow_backend("pallas", jnp.float64) == "xla"
    assert resolve_flow_backend("auto", jnp.float64) == "xla"
    # f32 keeps whatever was asked for; "auto" resolves by platform.
    assert resolve_flow_backend("pallas", jnp.float32) == "pallas"
    expected = "pallas" if jax.default_backend() == "tpu" else "xla"
    assert resolve_flow_backend("auto", jnp.float32) == expected
    # The direct multifrontal backend is dense-XLA and dtype-generic —
    # it is NOT rewritten (solvers/multifrontal.py handles f64).
    assert resolve_flow_backend("mf", jnp.float64) == "mf"


def test_tiled_operator_skips_oversized_packs(monkeypatch):
    """The RCM-tiled pack at the cube fixture's finest level is ~8.5 GB in
    f64 and OOMs a 16 GB chip; _tiled_operator must return None past the
    byte budget (callers fall back to plain ELL SpMV)."""
    from meshopticalflow_tpu.models import base as mbase

    n, w = 64, 4
    cols = jnp.asarray(np.arange(n * w).reshape(n, w) % n, jnp.int32)
    vals = jnp.ones((n, w), jnp.float32)

    class Holder:
        pass

    h = Holder()
    op = mbase._tiled_operator(cols, vals, h, "flow_bsr")
    assert op is not None
    y = op.matvec(jnp.ones(n, jnp.float32))
    assert y.shape == (n,)

    monkeypatch.setattr(mbase, "_TILED_OP_MAX_BYTES", 16)
    h2 = Holder()
    assert mbase._tiled_operator(cols, vals, h2, "flow_bsr") is None
    # The skip decision is cached — second call short-circuits too.
    assert h2.flow_bsr == ("skip",)
    assert mbase._tiled_operator(cols, vals, h2, "flow_bsr") is None
