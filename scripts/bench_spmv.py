"""Micro-benchmark: padded-ELL vs block-ELL SpMV on the demo operator.

Builds the Whitney smoothness operator for the subdivided Example mesh
(N=324,600, the round-1 bench's hot operator) and times both matvec paths
on whatever device JAX picks. Round-1 numbers on one TPU v5e chip:
ELL (W=19) 44.0 ms; block-ELL 32x128 (K=12) 9.6 ms single-rhs, 8.7 ms at
six right-hand sides. See BASELINE.md.

Usage: python scripts/bench_spmv.py [mesh.ply]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from meshopticalflow_tpu.config import FlowConfig
from meshopticalflow_tpu.geometry.mesh import build_mesh
from meshopticalflow_tpu.geometry.subdivide import subdivide_mesh
from meshopticalflow_tpu.io.ply import read_triangle_mesh
from meshopticalflow_tpu.models.base import build_basis
from meshopticalflow_tpu.ops.bsr import (BlockEllDevice, block_ell_from_scipy,
                                         rcm_permutation)
from meshopticalflow_tpu.ops.ell import ell_from_scipy, ell_matvec
from meshopticalflow_tpu.utils.jitcache import enable_persistent_cache


def timeit(step, op, x, reps=20):
    """Time one matvec by chaining ``reps`` of them inside a single jit.

    block_until_ready can return before execution on the tunneled TPU
    backend, so per-dispatch wall timing under-reads; chaining inside one
    jit and fetching the result to host is robust (and matches how solvers
    actually consume the matvec). The operator arrays travel as jit
    ARGUMENTS — closing over them would bake GBs of constants into the
    compile payload.
    """

    def chain(op, v):
        for _ in range(reps):
            v = step(op, v)
        return v

    chained = jax.jit(chain)
    np.asarray(chained(op, x))
    t0 = time.time()
    np.asarray(chained(op, x * 1.000001))
    return (time.time() - t0) / reps * 1000


def main():
    enable_persistent_cache()
    mesh_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/Example/mesh.ply"
    m = read_triangle_mesh(mesh_path)
    diag = float(np.linalg.norm(m.vertices.max(0) - m.vertices.min(0)))
    tris, verts = subdivide_mesh(m.faces, m.vertices, 0.006 * diag)
    host, _ = build_basis(build_mesh(tris, vertices=verts), FlowConfig())
    s = host.smooth.tocsr()
    n = s.shape[0]
    print(f"device={jax.devices()[0].platform} N={n} nnz={s.nnz}")

    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    h = ell_from_scipy(s)
    cols, vals = jnp.asarray(h.cols), jnp.asarray(h.vals.astype(np.float32))
    print(f"ELL W={h.cols.shape[1]}: "
          f"{timeit(lambda op, v: ell_matvec(op[0], op[1], v), (cols, vals), x):.2f}"
          " ms/matvec")

    perm = rcm_permutation(s)
    for br, bc in ((8, 128), (32, 128), (128, 128)):
        dev = BlockEllDevice.from_host(block_ell_from_scipy(s, br, bc, perm=perm))
        k = dev.tile_cols.shape[1]
        gb = dev.vals.size * 4 / 1e9
        print(f"block-ELL {br}x{bc} K={k} ({gb:.2f} GB): "
              f"{timeit(lambda op, v: op.matvec(v), dev, x):.2f} ms/matvec")
        del dev

    from meshopticalflow_tpu.kernels.pallas_spmv import pallas_block_ell_from_scipy
    pdev = pallas_block_ell_from_scipy(s, perm=perm)
    k = pdev.tile_cols.shape[1]
    gb = pdev.vals_t.size * 4 / 1e9
    y_ref = s @ np.asarray(x, np.float64)
    y = np.asarray(pdev.matvec(x))
    err = float(np.abs(y - y_ref).max() / (np.abs(y_ref).max() or 1.0))
    print(f"pallas block-ELL 128x128 K={k} ({gb:.2f} GB): "
          f"{timeit(lambda op, v: op.matvec(v), pdev, x):.2f} ms/matvec "
          f"(rel err {err:.2e})")


if __name__ == "__main__":
    main()
