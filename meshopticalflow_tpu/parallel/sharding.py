"""Multi-chip scale-out over a jax.sharding.Mesh.

The reference's only parallelism is OpenMP threads in one process
(SURVEY.md section 2.7); the TPU-native analogs implemented here:

  * data/context parallel over LANES: the texel table (millions of texels)
    and the per-triangle barycenter lanes shard across devices; the mesh
    tables (EdgeXForm SoA, metric, uv wedges) replicate — they are MBs while
    the lanes are the big axis. ``advect_texture_sharded`` is an explicit
    shard_map with no cross-device traffic at all (embarrassingly parallel).
  * tensor-parallel-ish operator rows: the padded-ELL operators shard by
    row block; under jit-over-Mesh XLA inserts the all-gathers for x[cols]
    and turns CG dot products into global reductions (psum over ICI).

``sharded_level_step`` jits the fully-jittable fixed-iteration level step
(flow.fixed.flow_level_fixed) over a device mesh with those shardings —
this is the multi-chip training-step path the driver dry-runs.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from meshopticalflow_tpu.flow.fixed import flow_level_fixed
from meshopticalflow_tpu.kernels.advect import advect_texture
from meshopticalflow_tpu.kernels.tracing import TraceMesh


def make_device_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _row_sharded(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def level_step_shardings(mesh: Mesh, arrays, axis: str = "dp"):
    """Shardings for ProblemArrays: ELL operators row-sharded, signals
    row-sharded, trace tables replicated (gathered from every lane)."""
    rep = _replicated(mesh)
    row = _row_sharded(mesh, axis)
    n = mesh.devices.size

    def pick(x):
        # Shard the leading axis when it divides evenly; replicate otherwise.
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return row
        return rep

    tm_spec = jax.tree_util.tree_map(lambda _: rep, arrays.tm)
    rest = type(arrays)(
        tm=tm_spec,
        smooth_ops=jax.tree_util.tree_map(pick, arrays.smooth_ops),
        basis=jax.tree_util.tree_map(pick, arrays.basis),
        signals=pick(arrays.signals),
        area=rep,
    )
    return rest


def sharded_level_step(mesh: Mesh, arrays, axis: str = "dp",
                       smooth_iters: int = 16, flow_iters: int = 16,
                       min_step: float = 1e-2, max_steps: int = 128):
    """jit the full level step over a device mesh. Returns (fn, placed_arrays).

    fn(placed_arrays, coeffs, tfield, s_weight, v_weight) -> (coeffs', tfield', err)
    """
    spec = level_step_shardings(mesh, arrays, axis)
    placed = jax.device_put(arrays, spec)
    rep = _replicated(mesh)

    fn = jax.jit(
        functools.partial(flow_level_fixed, smooth_iters=smooth_iters,
                          flow_iters=flow_iters, min_step=min_step,
                          max_steps=max_steps),
        in_shardings=(spec, rep, rep, rep, rep),
        out_shardings=(rep, rep, rep),
    )
    return fn, placed


def advect_texture_sharded(
    mesh: Mesh,
    tm: TraceMesh,
    tfield: jnp.ndarray,
    tri_uvs: jnp.ndarray,
    texture: jnp.ndarray,
    src_t: jnp.ndarray,          # (N,) texel lanes — the sharded axis
    src_p: jnp.ndarray,          # (N, 2)
    length,
    min_step: float = 1e-2,
    max_steps: int = 4096,
    bilinear: bool = True,
    axis: str = "dp",
):
    """Texel advection sharded over lanes with replicated mesh tables — the
    context-parallel analog for large atlases (SURVEY.md section 5). Lanes
    must divide the device count (pad with -1 texels)."""
    from jax import shard_map  # jax>=0.8 top-level API

    n = mesh.devices.size
    if src_t.shape[0] % n:
        raise ValueError("pad the texel table to a multiple of the device count")
    length = jnp.asarray(length, src_p.dtype)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), tm), P(), P(), P(),
                  P(axis), P(axis, None), P()),
        out_specs=P(axis, None))
    def _run(tm_, tfield_, tri_uvs_, texture_, t_, p_, length_):
        return advect_texture(tm_, tfield_, tri_uvs_, texture_, t_, p_, length_,
                              min_step, max_steps, bilinear)

    return _run(tm, tfield, tri_uvs, texture, src_t, src_p, length)
