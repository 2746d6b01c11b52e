"""Patch aggregation: the third (densest-solvable) multigrid level.

The two-level solver's coarse grid is the pre-subdivision mesh (~40k faces,
~60k Whitney DoFs) — too large for a dense solve, so its solves ran on host
(one round trip per PCG iteration, the dominant cost on the tunneled TPU).
This module aggregates the coarse mesh's faces into PATCHES (~a few
thousand), giving a coarsest space small enough for a dense on-device
Cholesky on the MXU:

  * faces cluster by greedy BFS over face adjacency;
  * each patch carries 2 DoFs: a constant tangent vector in the chart of
    the patch's root face, transported to member faces by composing the
    chart transitions along a BFS spanning tree (curvature makes this
    approximate — fine for a multigrid transfer);
  * Whitney transfer: the coarse edge coefficient of a patch-constant field
    v is the 1-form integral <g_tau v_tau, edge_vec> (exact for constant
    fields per chart);
  * scalar transfer: vertex -> patch indicator (aggregation MG).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import scipy.sparse as sp

from meshopticalflow_tpu.geometry.mesh import CORNERS, HostMesh


def cluster_faces(mesh: HostMesh, target_size: int = 24) -> np.ndarray:
    """Greedy BFS clustering of faces into patches. Returns patch_of_face (T,)."""
    t_count = mesh.n_triangles
    opp = mesh.opp
    neighbors = np.full((t_count, 3), -1, np.int64)
    for j in range(3):
        o = opp[np.arange(t_count) * 3 + j]
        neighbors[:, j] = np.where(o >= 0, o // 3, -1)
    patch = np.full(t_count, -1, np.int64)
    order = np.arange(t_count)
    n_patches = 0
    from collections import deque
    for seed in order:
        if patch[seed] >= 0:
            continue
        pid = n_patches
        n_patches += 1
        patch[seed] = pid
        size = 1
        q = deque([seed])
        while q and size < target_size:
            f = q.popleft()
            for nb in neighbors[f]:
                if nb >= 0 and patch[nb] < 0 and size < target_size:
                    patch[nb] = pid
                    size += 1
                    q.append(nb)
    return patch


def patch_transports(mesh: HostMesh, patch: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-face linear maps to the patch-root chart via BFS-tree composition.

    Returns (root_of_patch (P,), l_to_root (T, 2, 2)) with l_to_root[f]
    mapping f-chart vectors into the patch root's chart.
    """
    from collections import deque

    t_count = mesh.n_triangles
    n_patches = int(patch.max()) + 1
    opp = mesh.opp
    l_to_root = np.zeros((t_count, 2, 2))
    roots = np.full(n_patches, -1, np.int64)
    visited = np.zeros(t_count, bool)
    # First face of each patch in scan order is the root.
    for f in range(t_count):
        p = patch[f]
        if roots[p] < 0:
            roots[p] = f
    for p in range(n_patches):
        root = roots[p]
        l_to_root[root] = np.eye(2)
        visited[root] = True
        q = deque([root])
        while q:
            f = q.popleft()
            for j in range(3):
                e = 3 * f + j
                o = opp[e]
                if o < 0:
                    continue
                nb = o // 3
                if visited[nb] or patch[nb] != p:
                    continue
                # xform on edge o (an edge of nb) maps nb-chart -> f-chart.
                l_to_root[nb] = l_to_root[f] @ mesh.xform_linear[o]
                visited[nb] = True
                q.append(nb)
    return roots, l_to_root


def whitney_patch_p2(mesh: HostMesh, patch: np.ndarray,
                     l_to_root: np.ndarray) -> sp.csr_matrix:
    """(E, 2P) transfer: Whitney coefficients of patch-constant fields.

    For first-visit edge e = (tau, j): integral of the flat of the constant
    field over the chart edge, v_tau = l_to_root[tau]^{-1} v_root.
    """
    from meshopticalflow_tpu.models.whitney import edge_reduction

    red, sign, expanded = edge_reduction(mesh.opp)
    e_count = len(expanded)
    t = expanded // 3
    j = expanded % 3
    evec = CORNERS[(j + 2) % 3] - CORNERS[(j + 1) % 3]       # (E, 2)
    l_inv = np.linalg.inv(l_to_root[t])                      # (E, 2, 2)
    # weight[:, a] = (g_tau @ l_inv[:, :, a]) . evec
    gv = np.einsum("eij,eja->eia", mesh.g[t], l_inv)          # (E, 2, 2)
    w = np.einsum("eia,ei->ea", gv, evec)                     # (E, 2)
    pid = patch[t]
    rows = np.repeat(np.arange(e_count), 2)
    cols = (2 * pid[:, None] + np.arange(2)[None, :]).ravel()
    n_patches = int(patch.max()) + 1
    return sp.coo_matrix((w.ravel(), (rows, cols)),
                         shape=(e_count, 2 * n_patches)).tocsr()


def vertex_patch_p2(mesh: HostMesh, patch: np.ndarray) -> sp.csr_matrix:
    """(V, P) scalar aggregation transfer: vertex -> patch indicator."""
    v_count = mesh.n_vertices
    tri = mesh.triangles.astype(np.int64)
    vertex_patch = np.full(v_count, -1, np.int64)
    for c in range(3):
        mask = vertex_patch[tri[:, c]] < 0
        vertex_patch[tri[:, c][mask]] = patch[mask]
    n_patches = int(patch.max()) + 1
    return sp.coo_matrix((np.ones(v_count), (np.arange(v_count), vertex_patch)),
                         shape=(v_count, n_patches)).tocsr()


def compose_gather_rows(comp_idx: np.ndarray, comp_wt: np.ndarray,
                        p_csr: sp.csr_matrix) -> Tuple[np.ndarray, np.ndarray]:
    """Compose per-triangle gather rows with a further sparse transfer.

    comp_idx: (T, K) indices into the domain of p_csr (n rows);
    comp_wt: (T, 2, K); p_csr: (n, m). Returns (idx2 (T, K2), wt2 (T, 2, K2))
    with fixed fan-in K2 = max distinct m-columns per triangle.
    """
    t_count, k = comp_idx.shape
    indptr, indices, data = p_csr.indptr, p_csr.indices, p_csr.data
    # Gather each fine slot's transfer row (padded).
    max_row = int(np.diff(indptr).max())
    cols = np.full((t_count, k, max_row), -1, np.int64)
    vals = np.zeros((t_count, k, max_row))
    fid = comp_idx.astype(np.int64)
    starts = indptr[fid]
    lens = indptr[fid + 1] - starts
    for o in range(max_row):
        valid = o < lens
        pos = np.minimum(starts + o, p_csr.nnz - 1)
        cols[..., o] = np.where(valid, indices[pos], -1)
        vals[..., o] = np.where(valid, data[pos], 0.0)
    flat_cols = cols.reshape(t_count, -1)
    flat_w = np.einsum("tak,tko->tako", comp_wt, vals).reshape(
        t_count, 2, -1)                                        # (T, 2, K*max_row)
    # Deduplicate columns per triangle.
    order = np.argsort(flat_cols, axis=1)
    sc = np.take_along_axis(flat_cols, order, axis=1)
    sw = np.take_along_axis(flat_w, order[:, None, :], axis=2)
    new_grp = np.concatenate([np.ones((t_count, 1), bool), sc[:, 1:] != sc[:, :-1]], axis=1)
    grp = np.cumsum(new_grp, axis=1) - 1                        # (T, KM) group ids
    k2 = int(grp.max()) + 1
    idx2 = np.zeros((t_count, k2), np.int64)
    wt2 = np.zeros((t_count, 2, k2))
    rows = np.repeat(np.arange(t_count), sc.shape[1])
    np.add.at(wt2[:, 0, :], (rows, grp.ravel()), sw[:, 0, :].ravel())
    np.add.at(wt2[:, 1, :], (rows, grp.ravel()), sw[:, 1, :].ravel())
    # idx2: representative column per group (use max to overwrite -1 padding).
    np.maximum.at(idx2, (rows, grp.ravel()), sc.ravel())
    idx2 = np.maximum(idx2, 0)
    return idx2, wt2
