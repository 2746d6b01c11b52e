"""meshopticalflow_tpu — a TPU-native surface optical-flow framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fabianprada/MeshOpticalFlow (C++/Eigen/OpenMP): halfway optical-flow alignment
of signals (per-vertex colors or uv textures) on triangle-mesh surfaces, plus
the vector-Laplacian spectrum and texture-baking tools.

Architecture (TPU-first, not a port):
  * host-side geometry preprocessing (numpy, float64) produces frozen,
    static-shape device arrays: triangle table, intrinsic metric, EdgeXForm
    SoA chart-transition table, texel sample table;
  * all static operators (smoothness energies, scalar mass/stiffness) are
    assembled on host and shipped as padded-ELL sparse matrices — SpMV on TPU
    is one gather + a fixed-width reduction;
  * the per-level Gauss-Newton flow system (data term + lambda * smoothness)
    is folded into a single ELL matrix via a precomputed slot map and solved
    with Jacobi-preconditioned CG (replacing the reference's repeated sparse
    Cholesky refactorizations, LinearSolvers.h:294-335);
  * geodesic tracing/advection (FEM.inl:901-994) runs as a batched, masked
    lax.while_loop over all texel/triangle lanes at once;
  * scale-out uses jax.sharding over a device mesh (lanes and matrix
    row-blocks sharded, CG dot-products reduced with psum).
"""

__version__ = "0.1.0"

import jax as _jax

# Make an explicit JAX_PLATFORMS env choice authoritative at import. The
# axon TPU plugin registers itself ahead of the env-var selection, so a
# library user running `JAX_PLATFORMS=cpu python script.py` can still
# attach to the tunneled TPU — which hard-wedges whatever process owns the
# device (memory: one TPU process at a time). The CLIs already call
# honor_platform_env(); this covers library imports. No-op when the env
# var is unset.
from meshopticalflow_tpu.utils.compat import honor_platform_env as _honor

_honor()

# TPU matmul/einsum default precision demotes float32 operands to bfloat16
# on the MXU (~3 significant digits). This framework's chart transforms,
# data terms, and CG dot products are all small einsums where that is a
# correctness problem (observed: systematic 1e-3-level drift per edge
# crossing in the tracing kernel). Force true float32 MXU passes.
_jax.config.update("jax_default_matmul_precision", "highest")

from meshopticalflow_tpu.config import FlowConfig, VectorFieldMode, ConnectionMode
from meshopticalflow_tpu.geometry.mesh import HostMesh, build_mesh, rotate90
from meshopticalflow_tpu.flow.pipeline import FlowProblem
from meshopticalflow_tpu.ops import fem_ops
from meshopticalflow_tpu.geometry import topology
