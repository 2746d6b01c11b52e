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
