"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without a pod (SURVEY.md section 4, item 5)."""

import os

# The axon TPU plugin prepends itself to jax_platforms no matter what the
# environment says; force CPU through the config (not just the env var).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_grid_mesh(n: int = 6, jitter: float = 0.0, seed: int = 0):
    """A flat [0,1]^2 grid mesh embedded in 3-D (closed=False)."""
    rs = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=1)
    if jitter:
        interior = ((xs > 0) & (xs < 1) & (ys > 0) & (ys < 1)).ravel()
        pts[interior, :2] += rs.uniform(-jitter, jitter, (interior.sum(), 2))
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, (i + 1) * n + j, (i + 1) * n + j + 1, i * n + j + 1
            tris.append([a, b, c])
            tris.append([a, c, d])
    return np.array(tris, np.int32), pts


def make_sphere_mesh(subdiv: int = 2):
    """A closed octahedron-based sphere mesh (all edges interior)."""
    verts = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    tris = [(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
            (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)]
    verts = [np.array(v, np.float64) for v in verts]
    for _ in range(subdiv):
        new_tris = []
        cache = {}

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
