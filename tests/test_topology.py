"""Intrinsic topology utilities (geometry/topology.py; FEM.inl:505-832)."""

import numpy as np
import pytest

from meshopticalflow_tpu.geometry import topology as T
from meshopticalflow_tpu.geometry.mesh import (HostMesh, build_mesh,
                                               sanity_check,
                                               _half_edge_opposites,
                                               _edge_xforms)
from tests.conftest import make_grid_mesh, make_sphere_mesh


def _mesh_from_intrinsic(tris, g):
    """HostMesh from triangles + metric (no embedding)."""
    opp = _half_edge_opposites(np.asarray(tris, np.int32))
    lin, const = _edge_xforms(tris, g, opp)
    area = np.sqrt(np.linalg.det(g)) / 2.0
    return HostMesh(triangles=np.asarray(tris, np.int32), g=g,
                    g_inv=np.linalg.inv(g), area=area, opp=opp,
                    xform_linear=lin, xform_const=const,
                    n_vertices=int(np.asarray(tris).max()) + 1)


def test_subdivide_1to4_preserves_area_and_counts():
    tris, verts = make_sphere_mesh(1)
    mesh = build_mesh(tris, vertices=verts, make_unit_area=False)
    tris4, g4 = T.subdivide_1to4(mesh.triangles, mesh.g)
    assert len(tris4) == 4 * len(tris)
    e_count = (3 * len(tris)) // 2
    assert int(tris4.max()) + 1 == mesh.n_vertices + e_count
    area4 = np.sqrt(np.linalg.det(g4)) / 2.0
    np.testing.assert_allclose(area4.sum(), mesh.area.sum(), rtol=1e-12)
    # The subdivided intrinsic mesh is itself consistent.
    sanity_check(_mesh_from_intrinsic(tris4, g4))


def test_edge_flip_flat_square():
    """Flip the diagonal of a flat unit square: areas preserved, adjacency
    stays an involution, and the flipped mesh passes sanityCheck."""
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = build_mesh(tris, vertices=verts, make_unit_area=False)
    # Shared edge: find the interior half-edge.
    e = int(np.nonzero(mesh.opp >= 0)[0][0])
    ok, tris2, g2, opp2 = T.edge_flip(mesh.triangles, mesh.g, mesh.opp, e)
    assert ok
    area2 = np.sqrt(np.linalg.det(g2)) / 2.0
    np.testing.assert_allclose(area2.sum(), mesh.area.sum(), rtol=1e-12)
    m2 = _mesh_from_intrinsic(tris2, g2)
    # The flip's own adjacency must agree with recomputed pairing.
    np.testing.assert_array_equal(np.asarray(opp2), m2.opp)
    sanity_check(m2)
    # New shared edge connects the two previously-opposite vertices (1, 3).
    shared = set(tris2[0]) & set(tris2[1])
    assert shared == {1, 3}


def test_edge_flip_rejects_boundary():
    verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    tris = np.array([[0, 1, 2]], np.int32)
    mesh = build_mesh(tris, vertices=verts, make_unit_area=False)
    ok, *_ = T.edge_flip(mesh.triangles, mesh.g, mesh.opp, 0)
    assert not ok


def test_is_voronoi_edge_and_flip_restores_delaunay():
    """A skinny flat quad triangulated the wrong way fails the Voronoi
    (intrinsic Delaunay) test; flipping the diagonal fixes it."""
    verts = np.array([[0.0, 0, 0], [1, -0.15, 0], [2, 0, 0], [1, 0.15, 0]])
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = build_mesh(tris, vertices=verts, make_unit_area=False)
    e = int(np.nonzero(mesh.opp >= 0)[0][0])
    assert not T.is_voronoi_edge(mesh, e)
    ok, tris2, g2, opp2 = T.edge_flip(mesh.triangles, mesh.g, mesh.opp, e)
    assert ok
    m2 = _mesh_from_intrinsic(tris2, g2)
    e2 = int(np.nonzero(m2.opp >= 0)[0][0])
    assert T.is_voronoi_edge(m2, e2)


def test_vertex_circulation_flat_interior():
    tris, verts = make_grid_mesh(4)
    mesh = build_mesh(tris, vertices=verts, make_unit_area=False)
    # Find an interior vertex: one whose every incident corner's edges are
    # interior. Vertex 5 of a 4x4 grid is interior.
    t = int(np.nonzero((tris == 5).any(1))[0][0])
    v = int(np.nonzero(tris[t] == 5)[0][0])
    corners = T.get_vertex_corners(mesh, t, v)
    assert all(tris[c // 3][c % 3] == 5 for c in corners)
    assert len(corners) == len(set(c // 3 for c in corners))
    # Flat interior vertex: cone angle 2*pi, holonomy = identity.
    angle = T.get_vertex_cone_angle(mesh, t, v)
    np.testing.assert_allclose(angle, 2 * np.pi, rtol=1e-10)
    lin, _ = T.get_vertex_xform(mesh, t, v)
    np.testing.assert_allclose(lin, np.eye(2), atol=1e-9)


def test_vertex_cone_angle_octahedron_defect():
    """Octahedron vertices have cone angle 4 * (pi/3 * ...) < 2 pi and the
    circulation holonomy rotates by the angle defect."""
    tris, verts = make_sphere_mesh(0) if False else (None, None)
    # make_sphere_mesh(0) may not exist; build the octahedron directly.
    verts = np.array([(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                      (0, 0, 1), (0, 0, -1)], float)
    tris = np.array([(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
                     (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)], np.int32)
    mesh = build_mesh(tris, vertices=verts, make_unit_area=False)
    t = 0
    v = int(np.nonzero(tris[0] == 4)[0][0])
    angle = T.get_vertex_cone_angle(mesh, t, v)
    # 4 equilateral angles of pi/3 = 4pi/3.
    np.testing.assert_allclose(angle, 4 * np.pi / 3, rtol=1e-10)
    lin, _ = T.get_vertex_xform(mesh, t, v)
    # Holonomy is a rotation whose trace encodes the cone angle defect.
    np.testing.assert_allclose(np.linalg.det(lin), 1.0, atol=1e-9)


def test_get_prolongation_constant_and_partition():
    tris, verts = make_sphere_mesh(1)
    mesh = build_mesh(tris, vertices=verts)
    out = T.get_prolongation(mesh, np.full(mesh.n_triangles, 3.25))
    np.testing.assert_allclose(out, 3.25, rtol=1e-12)
    multi = T.get_prolongation(mesh, np.stack(
        [np.full(mesh.n_triangles, 1.0), np.arange(mesh.n_triangles, dtype=float)], 1))
    np.testing.assert_allclose(multi[:, 0], 1.0, rtol=1e-12)
