"""Synthetic problem builders shared by tests, bench, and the graft entry."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def octa_sphere(subdiv: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    """Closed octahedron-based sphere mesh (all edges interior)."""
    verts = [np.array(v, np.float64) for v in
             [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]]
    tris = [(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
            (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)]
    for _ in range(subdiv):
        cache = {}
        new_tris = []

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = verts[i] + verts[j]
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        for a, b, c in tris:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_tris += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        tris = new_tris
    return np.array(tris, np.int32), np.stack(verts)


def sphere_signal_pair(subdiv: int = 2, angle: float = 0.12):
    """Two signals on a sphere: f and f pulled back by a small z-rotation."""
    tris, verts = octa_sphere(subdiv)

    def f(p):
        return np.stack([
            128 + 100 * np.sin(3 * p[:, 0]) * np.cos(2 * p[:, 1]),
            128 + 100 * np.cos(3 * p[:, 1] + 1) * p[:, 2],
            128 + 100 * np.sin(2 * p[:, 2] + 0.5),
        ], axis=1)

    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return tris, verts, f(verts), f(verts @ rot.T)


def _sphere_signals(verts: np.ndarray, angle: float):
    def f(p):
        return np.stack([
            128 + 100 * np.sin(3 * p[:, 0]) * np.cos(2 * p[:, 1]),
            128 + 100 * np.cos(3 * p[:, 1] + 1) * p[:, 2],
            128 + 100 * np.sin(2 * p[:, 2] + 0.5),
        ], axis=1)

    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return f(verts), f(verts @ rot.T)


def synthetic_sphere_problem(config=None, subdiv: int = 2, angle: float = 0.12,
                             device_mesh=None, hierarchy: bool = False):
    """A ready FlowProblem on a synthetic rotated-signal sphere pair.

    ``hierarchy=True`` builds the fine mesh by tracked subdivision of the
    subdiv-level sphere and attaches the geometric coarse spaces — the
    multigrid + patch + refinement production configuration (the same
    solver stack as the 2K bench), so sharded tests and the driver dryrun
    exercise the solver users actually run (VERDICT r2 next #4)."""
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem
    from meshopticalflow_tpu.geometry.mesh import build_mesh

    config = config or FlowConfig(dog_weight=0.0, levels=4)
    if not hierarchy:
        tris, verts, sig0, sig1 = sphere_signal_pair(subdiv, angle)
        mesh = build_mesh(tris, vertices=verts)
        return FlowProblem(config, mesh, np.stack([sig0, sig1]), vertices=verts,
                           vertex_colors=np.stack([sig0, sig1]),
                           device_mesh=device_mesh)

    from meshopticalflow_tpu.geometry.subdivide import subdivide_tracked

    tris0, verts0 = octa_sphere(subdiv)
    uvs0 = np.zeros((len(tris0), 3, 2))
    e0 = verts0[tris0[:, 0]] - verts0[tris0[:, 1]]
    edge_len = 0.6 * float(np.median(np.linalg.norm(e0, axis=1)))
    tris, verts, _, parent, bary = subdivide_tracked(tris0, verts0, uvs0,
                                                     edge_len)
    sig0, sig1 = _sphere_signals(verts, angle)
    mesh = build_mesh(tris, vertices=verts)
    problem = FlowProblem(config, mesh, np.stack([sig0, sig1]), vertices=verts,
                          vertex_colors=np.stack([sig0, sig1]),
                          device_mesh=device_mesh, defer_signals=True)
    problem.attach_coarse_space(tris0, verts0, parent, bary)
    return problem
