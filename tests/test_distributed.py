"""True multi-process jax.distributed coverage (SURVEY §2.7 / §7 step 6).

Spawns TWO separate processes (2 virtual CPU devices each) that rendezvous
through ``parallel/distributed.py``'s env contract, build the 4-device
GLOBAL mesh, and run (a) a cross-process reduction and (b) the
chart-aligned halo-exchange PCG (`parallel/halo.py`) on a real sphere
smoothing system, checked against a host scipy solve. This upgrades the
single-process 8-virtual-device sharding tests to the actual
`jax.distributed.initialize` path the CLI uses on pods.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from meshopticalflow_tpu.parallel.distributed import (global_device_mesh,
                                                      maybe_init_distributed)
assert maybe_init_distributed()
assert jax.process_count() == 2, jax.process_count()
mesh = global_device_mesh()
assert len(jax.devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

# (a) cross-process reduction over the global mesh: local shards carry
# 1+process_index, so the global sum over [1,1,2,2] must be 6.
x = multihost_utils.host_local_array_to_global_array(
    np.full((2,), 1.0 + jax.process_index()), mesh, P("dp"))
total = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x))
assert total == 6.0, total

# (b) halo-exchange PCG across the process boundary on a real operator.
from meshopticalflow_tpu.config import FlowConfig
from meshopticalflow_tpu.geometry.mesh import build_mesh
from meshopticalflow_tpu.models.base import build_basis
from meshopticalflow_tpu.parallel.halo import build_halo_ell, halo_pcg
from meshopticalflow_tpu.utils.testing import sphere_signal_pair

tris, verts, _, _ = sphere_signal_pair(4)
mesh_h = build_mesh(tris, vertices=verts)
_, basis = build_basis(mesh_h, FlowConfig(dtype="float32"))
vals = np.asarray(basis.s_vals, np.float64).copy()
vals[np.arange(vals.shape[0]), np.asarray(basis.diag_slot)] += 1e-2
cols = np.asarray(basis.ell_cols)
h = build_halo_ell(cols, jnp.asarray(vals, jnp.float32), mesh)
b = np.ones(h.n, np.float32)
xh, stats = halo_pcg(h, jnp.asarray(b), tol=1e-6, max_iters=512)
assert float(stats.rel_residual) < 1e-5

import scipy.sparse as sp
n, w = cols.shape
a = sp.csr_matrix((vals.ravel(), (np.repeat(np.arange(n), w), cols.ravel())),
                  shape=(n, n))
x_ref = sp.linalg.spsolve(a.tocsc(), b.astype(np.float64))
got = float(jnp.vdot(xh, xh))
want = float(x_ref @ x_ref)
assert abs(got - want) / want < 1e-4, (got, want)
print("DIST_OK", jax.process_index(), round(total, 1), round(got, 6))
"""


def test_two_process_distributed_halo_pcg():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    code = _WORKER % {"repo": REPO}
    procs = []
    for i in range(2):
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=2",
                   MESHFLOW_COORDINATOR=f"127.0.0.1:{port}",
                   MESHFLOW_NUM_PROCESSES="2", MESHFLOW_PROCESS_ID=str(i))
        procs.append(subprocess.Popen([sys.executable, "-c", code], env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"proc {i}:\n{err[-3000:]}"
        outs.append([l for l in out.splitlines() if l.startswith("DIST_OK")])
    # Both processes reached the end and agree on the global results.
    assert outs[0] and outs[1]
    assert outs[0][0].split()[2:] == outs[1][0].split()[2:]
