"""Intrinsic-topology utilities of FEM::RiemannianMesh (FEM.inl:505-832).

The last L4 components of the reference left out of round 1 (VERDICT r1
missing #6): 1-to-4 subdivision, the intrinsic edge flip, Voronoi-edge
predicate, vertex circulation (corners / cone angle / accumulated chart
transform), and the face-to-vertex prolongation.

These are host-side mesh-surgery helpers (the reference mutates its CSR
mesh in place); they operate on plain numpy arrays so callers rebuild a
HostMesh via geometry.mesh.build_mesh-style constructors when done.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from meshopticalflow_tpu.geometry.mesh import (CORNERS, HostMesh,
                                               _edge_xforms, rotate90)
from meshopticalflow_tpu.ops.fem_ops import DUAL_CIRCUMCENTRIC, dual_center


def _dot(g, a, b):
    return np.einsum("...a,...ab,...b->...", a, g, b)


def subdivide_1to4(triangles: np.ndarray,
                   g: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Intrinsic 1-to-4 subdivision (FEM.inl:513-540): midpoint vertices per
    undirected edge, four children per triangle, child metric g/4."""
    triangles = np.asarray(triangles, np.int64)
    t_count = len(triangles)
    v_count = int(triangles.max()) + 1
    i1 = triangles[:, [1, 2, 0]]
    i2 = triangles[:, [2, 0, 1]]
    lo = np.minimum(i1, i2)
    hi = np.maximum(i1, i2)
    keys = (hi.astype(np.int64) << 32) | lo.astype(np.int64)
    uniq, inv = np.unique(keys.ravel(), return_inverse=True)
    e_index = (v_count + inv).reshape(t_count, 3)
    tris4 = np.empty((4 * t_count, 3), np.int64)
    tris4[0::4] = e_index
    tris4[1::4] = np.stack([triangles[:, 0], e_index[:, 2], e_index[:, 1]], 1)
    tris4[2::4] = np.stack([e_index[:, 2], triangles[:, 1], e_index[:, 0]], 1)
    tris4[3::4] = np.stack([e_index[:, 1], e_index[:, 0], triangles[:, 2]], 1)
    g4 = np.repeat(np.asarray(g, np.float64) / 4.0, 4, axis=0)
    return tris4.astype(np.int32), g4


def edge_flip(triangles: np.ndarray, g: np.ndarray, opp: np.ndarray,
              edge: int, eps: float = 0.0):
    """Intrinsic edge flip (FEM.inl:615-692) on copies of the mesh arrays.

    Returns (flipped, triangles, g, opp); when ``flipped`` is False the
    inputs are returned unchanged (boundary edge or non-convex quad).
    """
    triangles = np.asarray(triangles)
    g = np.asarray(g, np.float64)
    opp = np.asarray(opp)
    lin, const = _edge_xforms(triangles, g, opp)
    oedge = int(opp[edge])
    if oedge < 0:
        return False, triangles, g, opp
    t, v = edge // 3, edge % 3
    ot, ov = oedge // 3, oedge % 3

    o_vertex = lin[oedge] @ CORNERS[ov] + const[oedge]
    new_edge = np.stack([CORNERS[v], o_vertex])
    old_edge = np.stack([CORNERS[(v + 1) % 3], CORNERS[(v + 2) % 3]])
    m = np.stack([new_edge[1] - new_edge[0],
                  -(old_edge[1] - old_edge[0])], axis=-1)
    if abs(np.linalg.det(m)) < 1e-300:
        return False, triangles, g, opp
    st = np.linalg.solve(m, old_edge[0] - new_edge[0])
    if st[0] <= eps or st[0] >= 1 - eps or st[1] <= eps or st[1] >= 1 - eps:
        return False, triangles, g, opp

    triangles = triangles.copy()
    g = g.copy()
    opp = opp.copy()
    tris_new = np.array([
        [triangles[t][(v + 1) % 3], triangles[ot][ov], triangles[t][v]],
        [triangles[t][(v + 2) % 3], triangles[t][v], triangles[ot][ov]]])
    d_new = new_edge[1] - new_edge[0]
    l_new = _dot(g[t], d_new, d_new)
    t0 = np.zeros((2, 2))
    t0[0, 0] = _dot(g[ot], CORNERS[ov] - CORNERS[(ov + 2) % 3],
                    CORNERS[ov] - CORNERS[(ov + 2) % 3])
    t0[1, 1] = _dot(g[t], CORNERS[v] - CORNERS[(v + 1) % 3],
                    CORNERS[v] - CORNERS[(v + 1) % 3])
    t0[0, 1] = t0[1, 0] = (t0[0, 0] + t0[1, 1] - l_new) / 2.0
    t1 = np.zeros((2, 2))
    t1[0, 0] = _dot(g[t], CORNERS[v] - CORNERS[(v + 2) % 3],
                    CORNERS[v] - CORNERS[(v + 2) % 3])
    t1[1, 1] = _dot(g[ot], CORNERS[ov] - CORNERS[(ov + 1) % 3],
                    CORNERS[ov] - CORNERS[(ov + 1) % 3])
    t1[0, 1] = t1[1, 0] = (t1[0, 0] + t1[1, 1] - l_new) / 2.0

    # Neighbor adjacency rewiring (FEM.inl:668-681).
    old_adj = np.array([[opp[t * 3], opp[t * 3 + 1], opp[t * 3 + 2]],
                        [opp[ot * 3], opp[ot * 3 + 1], opp[ot * 3 + 2]]])
    if opp[t * 3 + (v + 1) % 3] >= 0:
        opp[opp[t * 3 + (v + 1) % 3]] = 3 * ot + 2
    if opp[ot * 3 + (ov + 1) % 3] >= 0:
        opp[opp[ot * 3 + (ov + 1) % 3]] = 3 * t + 2
    if opp[t * 3 + (v + 2) % 3] >= 0:
        opp[opp[t * 3 + (v + 2) % 3]] = 3 * t + 1
    if opp[ot * 3 + (ov + 2) % 3] >= 0:
        opp[opp[ot * 3 + (ov + 2) % 3]] = 3 * ot + 1
    opp[3 * t] = 3 * ot
    opp[3 * t + 1] = old_adj[0][(v + 2) % 3]
    opp[3 * t + 2] = old_adj[1][(ov + 1) % 3]
    opp[3 * ot] = 3 * t
    opp[3 * ot + 1] = old_adj[1][(ov + 2) % 3]
    opp[3 * ot + 2] = old_adj[0][(v + 1) % 3]

    triangles[t] = tris_new[0]
    triangles[ot] = tris_new[1]
    g[t] = t0
    g[ot] = t1
    return True, triangles, g, opp


def is_voronoi_edge(mesh: HostMesh, e: int, eps: float = 0.0) -> bool:
    """isVoronoiEdge (FEM.inl:762-772): the opposite vertex lies outside the
    circumcircle of e's triangle (the intrinsic Delaunay condition)."""
    oe = int(mesh.opp[e])
    if oe < 0:
        return True
    t = e // 3
    ov = oe % 3
    center = dual_center(mesh.g[t:t + 1], DUAL_CIRCUMCENTRIC)[0]
    o_vertex = mesh.xform_linear[oe] @ CORNERS[ov] + mesh.xform_const[oe]
    lhs = _dot(mesh.g[t], center - o_vertex, center - o_vertex) + eps
    rhs = _dot(mesh.g[t], center - CORNERS[0], center - CORNERS[0])
    return bool(lhs > rhs)


# Vertex circulation (FEM.inl:775-832). VertexToEdgeMap/EdgeToVertexMap are
# both {1, 2, 0}: from corner v leave through edge (v+1)%3; entering through
# half-edge oe you sit at corner (oe%3 + ...) per the reference tables.
_V2E = [1, 2, 0]
_E2V = [1, 2, 0]


def get_vertex_corners(mesh: HostMesh, t: int, v: int) -> List[int]:
    """getVertexCorners: the (triangle*3 + corner) ring around vertex
    (t, v), circulating CCW. Raises on boundary vertices like the
    reference (which exits)."""
    out = []
    ct, cv = t, v
    while True:
        edge = ct * 3 + _V2E[cv]
        oe = int(mesh.opp[edge])
        out.append(ct * 3 + cv)
        if oe < 0:
            raise ValueError("boundary vertex")
        ct = oe // 3
        cv = _E2V[oe % 3]
        if ct == t:
            return out


def get_vertex_cone_angle(mesh: HostMesh, t: int, v: int) -> float:
    """getVertexConeAngle: total interior angle around vertex (t, v)."""
    total = 0.0
    for corner in get_vertex_corners(mesh, t, v):
        ct, cv = corner // 3, corner % 3
        gg = mesh.g[ct]
        e1 = CORNERS[(cv + 1) % 3] - CORNERS[cv]
        e2 = CORNERS[(cv + 2) % 3] - CORNERS[cv]
        cosang = _dot(gg, e1, e2) / np.sqrt(_dot(gg, e1, e1) * _dot(gg, e2, e2))
        total += float(np.arccos(np.clip(cosang, -1.0, 1.0)))
    return total


def get_vertex_xform(mesh: HostMesh, t: int, v: int) -> Tuple[np.ndarray, np.ndarray]:
    """getVertexXForm: the chart transform accumulated by circulating once
    around vertex (t, v) — its linear part's rotation angle is the cone
    angle defect. Returns (linear (2,2), const (2,))."""
    lin = np.eye(2)
    const = np.zeros(2)
    ct, cv = t, v
    while True:
        edge = ct * 3 + _V2E[cv]
        oe = int(mesh.opp[edge])
        if oe < 0:
            raise ValueError("boundary vertex")
        lin = mesh.xform_linear[edge] @ lin
        const = mesh.xform_linear[edge] @ const + mesh.xform_const[edge]
        ct = oe // 3
        cv = _E2V[oe % 3]
        if ct == t:
            return lin, const


def get_prolongation(mesh: HostMesh, face_data: np.ndarray) -> np.ndarray:
    """getProlongation (FEM.inl:1470-1504): area-weighted face-to-vertex
    averaging. face_data: (T,) or (T, C)."""
    face_data = np.asarray(face_data, np.float64)
    single = face_data.ndim == 1
    fd = face_data[:, None] if single else face_data
    v_count = mesh.n_vertices
    acc = np.zeros((v_count, fd.shape[1]))
    areas = np.zeros(v_count)
    flat = mesh.triangles.astype(np.int64).ravel()
    np.add.at(acc, flat, np.repeat(fd * mesh.area[:, None], 3, axis=0))
    np.add.at(areas, flat, np.repeat(mesh.area, 3))
    out = acc / areas[:, None]
    return out[:, 0] if single else out
