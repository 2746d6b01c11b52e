"""Artifact cache (utils/artifacts.py): roundtrip, CSR members, lazy loads."""

import numpy as np
import pytest
import scipy.sparse as sp

from meshopticalflow_tpu.utils import artifacts


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("MESHFLOW_CACHE", str(tmp_path))
    return tmp_path


def test_cached_roundtrip_with_csr(cache_dir):
    calls = []

    def compute():
        calls.append(1)
        return dict(a=np.arange(6).reshape(2, 3),
                    m=sp.csr_matrix(np.eye(3)))

    d1 = artifacts.cached("t", "k1", compute)
    d2 = artifacts.cached("t", "k1", compute)
    assert len(calls) == 1
    np.testing.assert_array_equal(d2["a"], d1["a"])
    assert (d2["m"] != d1["m"]).nnz == 0


def test_cached_lazy_keys_defer_payload(cache_dir):
    big = np.arange(1000, dtype=np.float32).reshape(100, 10)

    def compute():
        return dict(small=np.ones(3), big=big)

    d0 = artifacts.cached("t", "k2", compute, lazy_keys=("big",))
    # fresh compute returns the REAL array (nothing to defer)
    assert isinstance(d0["big"], np.ndarray)

    d1 = artifacts.cached("t", "k2", compute, lazy_keys=("big",))
    lz = d1["big"]
    assert isinstance(lz, artifacts.LazyNpzArray)
    # metadata without reading the payload
    assert lz.shape == (100, 10) and lz.ndim == 2
    assert np.dtype(lz.dtype) == np.float32
    # materialization matches; jnp.asarray path works too
    np.testing.assert_array_equal(np.asarray(lz), big)
    import jax.numpy as jnp
    np.testing.assert_array_equal(np.asarray(jnp.asarray(lz, jnp.float32)), big)
    # non-lazy loads still materialize
    d2 = artifacts.cached("t", "k2", compute)
    assert isinstance(d2["big"], np.ndarray)
