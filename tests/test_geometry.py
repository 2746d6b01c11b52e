import numpy as np
import pytest

from meshopticalflow_tpu.geometry import HostMesh, rotate90, subdivide_mesh, subdivide_textured_mesh
from meshopticalflow_tpu.geometry.mesh import build_mesh, sanity_check
from meshopticalflow_tpu.geometry.rasterize import barycentric_coords, rasterize_texture_source
from tests.conftest import make_grid_mesh, make_sphere_mesh


def test_rotate90_properties(rng):
    g = np.array([[2.0, 0.3], [0.3, 1.5]])
    v = rng.normal(size=(10, 2))
    w = rotate90(np.broadcast_to(g, (10, 2, 2)), v)
    # Perpendicular under g, same g-norm.
    dots = np.einsum("ij,jk,ik->i", v, g, w)
    np.testing.assert_allclose(dots, 0, atol=1e-12)
    np.testing.assert_allclose(
        np.einsum("ij,jk,ik->i", v, g, v), np.einsum("ij,jk,ik->i", w, g, w), rtol=1e-12)


def test_build_mesh_flat_grid():
    tris, verts = make_grid_mesh(5)
    mesh = build_mesh(tris, vertices=verts)
    np.testing.assert_allclose(mesh.total_area, 1.0, rtol=1e-12)  # makeUnitArea
    sanity_check(mesh)
    # Boundary edges exist on the open grid.
    assert (mesh.opp == -1).sum() > 0


def test_build_mesh_sphere_closed():
    tris, verts = make_sphere_mesh(2)
    mesh = build_mesh(tris, vertices=verts)
    sanity_check(mesh)
    assert (mesh.opp == -1).sum() == 0
    np.testing.assert_allclose(mesh.total_area, 1.0, rtol=1e-12)


def test_metric_from_edge_lengths_matches_embedding():
    tris, verts = make_grid_mesh(4, jitter=0.05, seed=3)
    m1 = build_mesh(tris, vertices=verts)
    # Edge j opposite corner j: lengths of (j+1, j+2) pairs.
    p = verts[tris]
    lengths = np.stack(
        [np.linalg.norm(p[:, (j + 1) % 3] - p[:, (j + 2) % 3], axis=1) for j in range(3)], axis=1)
    m2 = build_mesh(tris, edge_lengths=lengths)
    np.testing.assert_allclose(m1.g, m2.g, rtol=1e-10)


def test_edge_xform_chart_consistency():
    """A point on the shared edge has consistent images in both charts."""
    tris, verts = make_sphere_mesh(1)
    mesh = build_mesh(tris, vertices=verts)
    corners = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    for e in range(0, len(mesh.opp), 7):
        oe = mesh.opp[e]
        if oe < 0:
            continue
        j, oj = e % 3, oe % 3
        # Points along the shared edge map consistently: the edge of t runs
        # v->(j+1),(j+2); in the opposite chart it is (oj+2),(oj+1).
        for s in (0.0, 0.3, 1.0):
            p = corners[(j + 1) % 3] * (1 - s) + corners[(j + 2) % 3] * s
            q_expect = corners[(oj + 2) % 3] * (1 - s) + corners[(oj + 1) % 3] * s
            q = mesh.xform_linear[e] @ p + mesh.xform_const[e]
            np.testing.assert_allclose(q, q_expect, atol=1e-10)


def test_subdivide_plain():
    tris, verts = make_grid_mesh(3)
    t2, v2 = subdivide_mesh(tris, verts, edge_length=0.3)
    p = v2[t2]
    for j in range(3):
        l = np.linalg.norm(p[:, (j + 1) % 3] - p[:, (j + 2) % 3], axis=1)
        assert (l <= 0.3 + 1e-12).all()
    # Area is preserved.
    def total_area(t, v):
        p = v[t]
        return 0.5 * np.abs(np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])[..., 2] if p.shape[-1] == 3 else 0).sum()
    a1 = np.linalg.norm(np.cross(verts[tris][:, 1] - verts[tris][:, 0], verts[tris][:, 2] - verts[tris][:, 0]), axis=1).sum() / 2
    a2 = np.linalg.norm(np.cross(v2[t2][:, 1] - v2[t2][:, 0], v2[t2][:, 2] - v2[t2][:, 0]), axis=1).sum() / 2
    np.testing.assert_allclose(a1, a2, rtol=1e-12)


def test_subdivide_textured_consistent():
    tris, verts = make_grid_mesh(3)
    uvs = verts[tris][:, :, :2]  # uv = xy
    t2, v2, uv2 = subdivide_textured_mesh(tris, verts, uvs, edge_length=0.4)
    # uv == xy must be preserved by midpoint subdivision.
    np.testing.assert_allclose(uv2, v2[t2][:, :, :2], atol=1e-12)
    m = build_mesh(t2, vertices=v2)
    sanity_check(m)


def test_barycentric_coords():
    v = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 1.0]])
    p = np.array([0.5, 0.25])
    b = barycentric_coords(v, p)
    np.testing.assert_allclose(v[0] * (1 - b[0] - b[1]) + v[1] * b[0] + v[2] * b[1], p, atol=1e-14)


def test_rasterize_covers_atlas():
    # Two triangles covering the unit square; every texel claimed, correct bary.
    uvs = np.array([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float64)
    src = rasterize_texture_source(uvs, 32, 32, pad_radius=0)
    claimed = src.tri_idx != -1
    # The reference scanline skips zero-slope rows (MeshFlow.inl:315), so the
    # top row stays partially unclaimed before dilation; interior is full.
    assert claimed.reshape(32, 32)[:31].all()
    # Reconstruct uv from (tri, bary) and compare with the texel lattice.
    t = src.tri_idx[claimed]
    b = src.bary[claimed]
    uv = (uvs[t, 0] * (1 - b.sum(1))[:, None] + uvs[t, 1] * b[:, [0]] + uvs[t, 2] * b[:, [1]])
    jj, ii = np.divmod(np.arange(32 * 32)[claimed], 32)
    expect = np.stack([ii / 31.0, jj / 31.0], 1)
    np.testing.assert_allclose(uv, expect, atol=1e-9)
    # With dilation every texel is claimed.
    src2 = rasterize_texture_source(uvs, 32, 32, pad_radius=2)
    assert (src2.tri_idx != -1).all()


def test_rasterize_dilation_fills_margin():
    # A small triangle in the middle; dilation grows the claimed region.
    uvs = np.array([[[0.4, 0.4], [0.6, 0.4], [0.5, 0.6]]], np.float64)
    src0 = rasterize_texture_source(uvs, 64, 64, pad_radius=0)
    src2 = rasterize_texture_source(uvs, 64, 64, pad_radius=2)
    n0 = (src0.tri_idx != -1).sum()
    n2 = (src2.tri_idx != -1).sum()
    assert n2 > n0 > 0
    assert src2.needs_remap.sum() > 0  # dilated texels lie outside the triangle
