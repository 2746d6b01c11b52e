"""Native C++ host kernels == numpy oracle implementations."""

import numpy as np
import pytest

from meshopticalflow_tpu import native
from meshopticalflow_tpu.geometry.mesh import _half_edge_opposites
from meshopticalflow_tpu.geometry.rasterize import rasterize_texture_source
from tests.conftest import make_grid_mesh, make_sphere_mesh


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++)")
    return lib


def test_half_edge_native_matches_numpy(lib):
    for mesh_fn, arg in ((make_sphere_mesh, 2), (make_grid_mesh, 7)):
        tris, _ = mesh_fn(arg)
        got = native.half_edge_opposites(tris)
        # numpy path (bypass native inside by calling the sort-based core)
        import meshopticalflow_tpu.geometry.mesh as gm
        import meshopticalflow_tpu.native as nat
        real = nat.half_edge_opposites
        nat.half_edge_opposites = lambda t: None
        try:
            expect = gm._half_edge_opposites(tris)
        finally:
            nat.half_edge_opposites = real
        np.testing.assert_array_equal(got, expect)


def test_rasterize_native_matches_numpy(lib):
    rng = np.random.default_rng(7)
    uvs = rng.uniform(0.05, 0.95, (40, 3, 2))
    # Make triangles non-degenerate-ish.
    uvs[:, 1] = uvs[:, 0] + rng.uniform(0.05, 0.25, (40, 2))
    uvs[:, 2] = uvs[:, 0] + rng.uniform(-0.25, -0.05, (40, 2))
    uvs = np.clip(uvs, 0, 1)
    for pad in (0, 2):
        a = rasterize_texture_source(uvs, 64, 64, pad, use_native=True)
        b = rasterize_texture_source(uvs, 64, 64, pad, use_native=False)
        np.testing.assert_array_equal(a.tri_idx, b.tri_idx)
        claimed = a.tri_idx >= 0
        np.testing.assert_allclose(a.bary[claimed], b.bary[claimed], atol=1e-12)
        # needs_remap may differ only for texels sitting exactly on a
        # triangle boundary (1e-16-level sign flips in the inside test).
        border = np.minimum.reduce([b.bary[:, 0], b.bary[:, 1],
                                    1 - b.bary.sum(1)])
        robust = claimed & (np.abs(border) > 1e-9)
        np.testing.assert_array_equal(a.needs_remap[robust], b.needs_remap[robust])
