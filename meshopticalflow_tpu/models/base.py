"""Vector-field basis abstraction — TPU-native form of Src/VectorField.h.

A basis is (coefficients c, prolongation P, restriction P^T, smoothness S):
  * P maps coefficients to per-triangle tangent 2-vectors in barycentric
    chart coordinates (VectorField.h:107-112). All three reference bases
    share one structural fact this rebuild exploits: the coefficient indices
    feeding a triangle depend only on (triangle, slot), not on the chart
    component. So P is stored as a fixed-fan-in gather
        tfield[t, a] = sum_k p_wt[t, a, k] * c[p_idx[t, k]]
    and P^T is the matching segment-sum scatter.
  * S is static geometry — assembled once on host and shipped as padded ELL.
  * The per-level Gauss-Newton system  (R D P)/||R D P||_F + lambda * S
    (VectorField.h:46-104) is built on device by scatter-adding the
    closed-form R D P entries
        val[t, k, l] = sum_ab p_wt[t,a,k] D[t,a,b] p_wt[t,b,l]
    into precomputed slots of the union sparsity pattern, yielding ONE ELL
    matrix per level; it is solved with Jacobi-PCG instead of the
    reference's repeated sparse Cholesky refactorization.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from flax import struct

from meshopticalflow_tpu.config import ConnectionMode, FlowConfig, VectorFieldMode
from meshopticalflow_tpu.geometry.mesh import HostMesh
from meshopticalflow_tpu.ops.ell import HostEll, coo_slot_map, ell_from_scipy, ell_matvec
from meshopticalflow_tpu.solvers.cg import pcg


@dataclasses.dataclass
class BasisHost:
    """Host-side basis: prolongation structure + smoothness operator."""

    name: str
    n_coeffs: int
    p_idx: np.ndarray   # (T, K) int64 coefficient indices
    p_wt: np.ndarray    # (T, 2, K) float64 weights
    smooth: sp.csr_matrix


class BasisDevice(struct.PyTreeNode):
    """Frozen device-side basis (a pytree; shapes are static)."""

    p_idx: jnp.ndarray       # (T, K) int32
    p_wt: jnp.ndarray        # (T, 2, K)
    ell_cols: jnp.ndarray    # (N, W) int32 — union pattern of S and R D P
    s_vals: jnp.ndarray      # (N, W) smoothness values on the union pattern
    diag_slot: jnp.ndarray   # (N,) int32
    dt_slots: jnp.ndarray    # (T*K*K,) int32 flat slots of R D P entries
    n_coeffs: int = struct.field(pytree_node=False)

    @property
    def ell_width(self) -> int:
        return self.ell_cols.shape[1]


def finalize_basis(host: BasisHost, dtype=jnp.float32) -> BasisDevice:
    """Union the S pattern with the R D P pattern and precompute slot maps."""
    n = host.n_coeffs
    t_count, k = host.p_idx.shape
    rows = np.repeat(host.p_idx, k, axis=1).ravel()   # (T*K*K,) entry (t,k,l) -> p_idx[t,k]
    cols = np.tile(host.p_idx, (1, k)).ravel()        # -> p_idx[t,l]
    # Union of the S pattern and the R D P pattern. Nonzero dummy values keep
    # scipy from pruning structure; only the pattern of ``union`` is used.
    pattern = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n)).tocsr()
    s_pattern = host.smooth.copy().tocsr()
    s_pattern.data = np.ones_like(s_pattern.data)
    union = (s_pattern + pattern).tocsr()
    ell = ell_from_scipy(union)
    # Overwrite values with S alone (union assembly summed S + 0-pattern).
    s_coo = host.smooth.tocoo()
    s_slots = coo_slot_map(ell.cols, s_coo.row, s_coo.col)
    vals = np.zeros(ell.cols.shape, np.float64).ravel()
    np.add.at(vals, s_slots, s_coo.data)
    vals = vals.reshape(ell.cols.shape)
    dt_slots = coo_slot_map(ell.cols, rows, cols)
    return BasisDevice(
        p_idx=jnp.asarray(host.p_idx, jnp.int32),
        p_wt=jnp.asarray(host.p_wt, dtype),
        ell_cols=jnp.asarray(ell.cols),
        s_vals=jnp.asarray(vals, dtype),
        diag_slot=jnp.asarray(ell.diag_slot),
        dt_slots=jnp.asarray(dt_slots),
        n_coeffs=n,
    )


def build_basis(mesh: HostMesh, config: FlowConfig) -> Tuple[BasisHost, BasisDevice]:
    """Factory over the three basis families (OpticalFlow.cpp:862-870)."""
    from meshopticalflow_tpu.models.conformal import build_conformal_basis
    from meshopticalflow_tpu.models.connection import build_connection_basis
    from meshopticalflow_tpu.models.whitney import build_whitney_basis

    mode = VectorFieldMode(config.vf_mode)
    if mode == VectorFieldMode.WHITNEY:
        host = build_whitney_basis(mesh)
    elif mode == VectorFieldMode.CONFORMAL:
        host = build_conformal_basis(mesh, divergence_free=config.divergence_free)
    else:
        host = build_connection_basis(mesh, ConnectionMode(config.connection_mode))
    dev = finalize_basis(host, dtype=jnp.dtype(config.dtype))
    return host, dev


# ----------------------------------------------------------------------------
# Device-side operations (pure jnp, jit/shard_map friendly)
# ----------------------------------------------------------------------------

def prolong(basis: BasisDevice, coeffs: jnp.ndarray) -> jnp.ndarray:
    """tfield (T, 2) = P c  (GetTriangleVectorField, VectorField.h:107-112)."""
    return jnp.einsum("tak,tk->ta", basis.p_wt, coeffs[basis.p_idx])


def restrict(basis: BasisDevice, tfield: jnp.ndarray) -> jnp.ndarray:
    """c (n,) = P^T y for per-triangle 2-vectors y."""
    contrib = jnp.einsum("tak,ta->tk", basis.p_wt, tfield)
    return jax.ops.segment_sum(contrib.ravel(), basis.p_idx.ravel(),
                               num_segments=basis.n_coeffs)


def reduce_rhs(basis: BasisDevice, rhs_t: jnp.ndarray) -> jnp.ndarray:
    """R rhs, rhs given per triangle (T, 2)."""
    return restrict(basis, rhs_t)


def data_term_ell_vals(basis: BasisDevice, d_blocks: jnp.ndarray) -> jnp.ndarray:
    """Assembled R D P on the union ELL pattern (flattened (N*W,)).

    Duplicate COO entries (e.g. a coefficient seen from both triangles of an
    edge) fold in the scatter-add, so the Frobenius norm of the result equals
    the reference's dataTerm.SquareNorm() (VectorField.h:57)."""
    vals = jnp.einsum("tak,tab,tbl->tkl", basis.p_wt, d_blocks, basis.p_wt)
    flat = jnp.zeros(basis.ell_cols.size, dtype=vals.dtype)
    return flat.at[basis.dt_slots].add(vals.ravel())


@jax.jit
def build_flow_system(basis: BasisDevice, d_blocks, rhs_t, vf_smooth_weight):
    """Assemble the level system (R D P)/||.||_F + lambda S on the union ELL
    pattern plus the reduced, rescaled rhs (VectorField.h:51-67)."""
    n, w = basis.ell_cols.shape
    dt_flat = data_term_ell_vals(basis, d_blocks)
    frob = jnp.sqrt(jnp.sum(dt_flat * dt_flat))
    scale = jnp.where(frob > 0, 1.0 / frob, 0.0)
    dt_vals = (dt_flat * scale).reshape(n, w)
    sys_vals = dt_vals + vf_smooth_weight * basis.s_vals
    rhs = reduce_rhs(basis, rhs_t) * scale
    diag = jnp.take_along_axis(sys_vals, basis.diag_slot[:, None], axis=1)[:, 0]
    return sys_vals, dt_vals, rhs, diag, scale


def _patch_s2_device(patch):
    """One-time device materialization of the patch coarsest dense block.

    Under mg_coarse_exact the handle keeps ``s2_dense`` host-side (possibly
    a LazyNpzArray fallback, flow/pipeline.py attach path); solvers that DO
    consume it (the XLA ThreeLevelSolver — the float64-on-TPU route — and
    the Pallas banded-breakdown fallback) rebuild per level, so the upload
    (~100-200 MB over the ~16 MB/s tunnel) must not recur per build. The
    device copy is cached on the handle, dtype-preserving (stored f32)."""
    if isinstance(patch.s2_dense, jax.Array):
        return patch.s2_dense          # non-lazy path: already resident
    cur = getattr(patch, "_s2_dev", None)
    if cur is None:
        import numpy as np
        cur = jnp.asarray(np.asarray(patch.s2_dense))
        patch._s2_dev = cur
    return cur


@jax.jit
def patch_system_dense(q2_idx, q2_wt, d_blocks, scale, vf_smooth_weight, s2_dense):
    """Dense coarsest Galerkin system: scale * Q2^T D Q2 + lambda * S2."""
    vals = jnp.einsum("tak,tab,tbl->tkl", q2_wt, d_blocks, q2_wt)
    n2 = s2_dense.shape[0]
    flat = (q2_idx[:, :, None] * n2 + q2_idx[:, None, :]).reshape(-1)
    dt2 = jnp.zeros(n2 * n2, vals.dtype).at[flat].add(vals.reshape(-1)).reshape(n2, n2)
    return dt2 * scale + vf_smooth_weight * s2_dense


@jax.jit
def coarse_system_vals(coarse_dev: "BasisDevice", d_blocks, scale, vf_smooth_weight):
    """Galerkin coarse system values AND their diagonal: scale * Q^T D Q +
    lambda * S0 — the exact P0^T A P0 of the fine system (models/coarse.py).
    The diagonal extraction rides the same dispatch (it was a separate eager
    take_along_axis per level)."""
    n, w = coarse_dev.ell_cols.shape
    dt0 = data_term_ell_vals(coarse_dev, d_blocks) * scale
    vals = dt0.reshape(n, w) + vf_smooth_weight * coarse_dev.s_vals
    diag = jnp.take_along_axis(vals, coarse_dev.diag_slot[:, None], axis=1)[:, 0]
    return vals, diag


@jax.jit
def finalize_flow_step(basis: BasisDevice, coeffs, x, dt_vals, rhs):
    """Optimal step tau = (x . rhs) / (x . dataTerm x) and coefficient
    update (VectorField.h:89-103)."""
    dx = ell_matvec(basis.ell_cols, dt_vals, x)
    denom = jnp.vdot(x, dx)
    num = jnp.vdot(x, rhs)
    step = jnp.where(denom != 0, num / jnp.where(denom != 0, denom, 1.0), 0.0)
    new_coeffs = coeffs + step * x
    return new_coeffs, prolong(basis, new_coeffs)


_TILED_OP_MAX_BYTES = 1 << 30  # padded-tile budget; ~3x that is live
                               # during revaluation (zeros + scatter out)


def _tiled_operator(ell_cols, ell_vals, cache_holder, attr: str):
    """RCM-tiled operator (ops/bsr.py) revalued from a padded-ELL system.

    The sparsity pattern is static, so the pack (RCM order, tile layout,
    ELL-slot -> tile-slot scatter map) is computed once per problem and
    cached on ``cache_holder.<attr>``; each Gauss-Newton step only
    scatter-adds the fresh ELL values into a zeroed tile array on device.

    Returns None (cached) when the padded tile array would exceed
    ``_TILED_OP_MAX_BYTES`` for this dtype — at the cube fixture's finest
    level the f64 pack is ~8.5 GB and OOMs a 16 GB chip (measured
    2026-08-20); callers fall back to plain ELL SpMV, which
    solvers/mg3.ThreeLevelSolver accepts (fine_bsr/c1_bsr=None).
    """
    import numpy as np

    from meshopticalflow_tpu.ops.bsr import (BlockEllDevice,
                                             block_ell_from_scipy, entry_slots)

    itemsize = jnp.dtype(ell_vals.dtype).itemsize
    cached = getattr(cache_holder, attr, None)
    if cached is None:
        import scipy.sparse as sp

        cols_h = np.asarray(ell_cols)
        n, w = cols_h.shape
        rows_h = np.repeat(np.arange(n), w)
        pattern = sp.csr_matrix((np.ones(n * w), (rows_h, cols_h.ravel())),
                                shape=(n, n))
        hb = block_ell_from_scipy(pattern, 32, 128)
        if int(np.prod(hb.vals.shape)) * itemsize > _TILED_OP_MAX_BYTES:
            setattr(cache_holder, attr, ("skip",))
            return None
        slots = entry_slots(hb, rows_h, cols_h.ravel())
        dev = BlockEllDevice.from_host(hb)
        cached = (dev.tile_cols, dev.perm, dev.inv_perm,
                  jnp.asarray(slots, jnp.int32), hb.vals.shape, n)
        setattr(cache_holder, attr, cached)
    if cached == ("skip",):
        return None
    tile_cols, perm, inv_perm, slots, shape, n = cached
    if int(np.prod(shape)) * itemsize > _TILED_OP_MAX_BYTES:
        return None   # pack was built for a narrower dtype than this call's
    vals = jnp.zeros(int(np.prod(shape)), ell_vals.dtype) \
        .at[slots].add(ell_vals.ravel()).reshape(shape)
    return BlockEllDevice(tile_cols, vals, perm, inv_perm, n)


# Streamed-bytes estimate of the most recent flow solve ({"gb": float|None};
# None when the solver has no bandwidth model). Same reporting pattern as
# solvers.refine._LAST_ROUNDS: the pipeline reads it right after
# update_optical_flow returns to attach an effective-GB/s level metric.
LAST_FLOW_SOLVE = {"gb": None}

# Pinned refinement round schedules, keyed by ("flow", pack uid): measured
# by the first adaptive level of a problem, replayed by later levels as a
# fetch-free dispatch chain (see the refine branch of update_optical_flow).
_FLOW_SCHED: dict = {}


def _quantize_iters(n: int) -> int:
    """Round a measured round length UP to the {24, 48, 96} chunk ladder
    (chunk length is a compiled static shape; three shapes cover all)."""
    for cand in (24, 48, 96):
        if n <= cand:
            return cand
    return 96


def _sched_disk_key(solver, refine_tol, sched_key) -> str:
    """Stable cross-process identity of a pinned schedule: the pack's
    artifact key (mesh + basis config) + level + tolerance. Empty for
    ad-hoc packs (no artifact identity) — those stay process-local."""
    try:
        from meshopticalflow_tpu.solvers.pallas_mg import _PACKS

        ck = getattr(_PACKS.get(solver.pack_id), "cache_key", "") or ""
    except Exception:
        ck = ""
    if not ck:
        return ""
    sk = "_".join(map(str, sched_key)) if isinstance(sched_key, tuple) \
        else str(sched_key)
    return f"{ck}.L{sk}.t{refine_tol:.0e}"


def _flow_schedule_for(solver, rhs, x0, refine_tol, sched_key=None):
    """The pinned schedule for this solver's pack, if the fixed pipelined
    path applies (banded Pallas solver, f32, cold start, df32 backend).

    Misses fall through to the DISK record a previous process persisted
    (utils/artifacts.load_json): replaying the identical schedule makes the
    fixed-pipeline executables hit the cross-process XLA compilation cache,
    so a fresh process's early draws skip both the adaptive measuring
    fetches AND the per-process recompile (round-5: 75-105 s on draw 2)."""
    import jax as _jax

    if x0 is not None or not hasattr(solver, "solve_fixed"):
        return None
    if getattr(solver, "c1_dinv", None) is None:
        return None
    if jnp.dtype(rhs.dtype) != jnp.float32:
        return None
    from meshopticalflow_tpu.solvers.df32 import df32_probe
    if not df32_probe(_jax.default_backend()):
        return None
    mem_key = ("flow", solver.pack_id, sched_key)
    sched = _FLOW_SCHED.get(mem_key)
    if sched is None:
        from meshopticalflow_tpu.utils.artifacts import load_json

        rec = load_json("sched", _sched_disk_key(solver, refine_tol,
                                                 sched_key))
        # Strict shape: only ladder-quantized round counts (anything else —
        # including JSON booleans, which are ints to isinstance — would
        # compile a fresh off-ladder executable, defeating the cache-hit
        # purpose of the record).
        if (isinstance(rec, list) and 0 < len(rec) <= 4
                and all(type(n) is int and n in (24, 48, 96) for n in rec)):
            sched = tuple(rec)
            _FLOW_SCHED[mem_key] = sched
    return sched


def _store_schedule(solver, refine_tol, sched_key, sched) -> None:
    _FLOW_SCHED[("flow", solver.pack_id, sched_key)] = sched
    from meshopticalflow_tpu.utils.artifacts import save_json

    save_json("sched", _sched_disk_key(solver, refine_tol, sched_key),
              list(sched))


def _maybe_pin_schedule(solver, stats, refine_tol, sched_key=None):
    """After a successful adaptive refinement, pin its measured round
    lengths (ladder-quantized) for this pack so later levels replay them
    without per-round fetches. Write-through to disk for the next process."""
    from meshopticalflow_tpu.solvers.refine import _LAST_ROUNDS

    rounds = _LAST_ROUNDS[0]
    if not hasattr(solver, "pack_id") or not rounds or len(rounds) > 3:
        return
    if float(stats.rel_residual) > 1.5 * refine_tol:
        return
    _store_schedule(solver, refine_tol, sched_key,
                    tuple(_quantize_iters(int(n)) for n, _ in rounds))


def _make_mg_solver(basis, coarse, patch, d_blocks, scale, vf_smooth_weight,
                    sys_vals, diag, backend, device_mesh, mg_cheb_k, mg_nu,
                    mg_fine_cheb, mg_coarse_exact, mg_c1_bf16):
    """Construct the iterative per-level flow solver: the Pallas 3-level
    MG-PCG on TPU, the tiled 3-level on XLA, the 2-level elsewhere, or the
    halo-exchange sharded cycle under a device mesh."""
    c_vals, c_diag = coarse_system_vals(coarse.coarse_dev, d_blocks, scale,
                                        vf_smooth_weight)
    if backend == "halo" and device_mesh is not None:
        # Halo-exchange sharded form of the production 2-level cycle
        # (parallel/halo.py): row-sharded fine level with ppermute
        # halos, replicated exact banded c1 solve. Opt-in
        # (flow_backend="halo") under a device mesh.
        from meshopticalflow_tpu.parallel.halo import flow_halo_solver
        return flow_halo_solver(device_mesh, basis.ell_cols, sys_vals,
                                diag, coarse.coarse_dev.ell_cols,
                                c_vals, coarse.p0_idx, coarse.p0_wt,
                                nu=mg_nu)
    if patch is not None and backend == "pallas":
        # Round-2 production path: Pallas block-ELL kernels, tile-space
        # state, bf16 smoothing (solvers/pallas_mg.py). The pattern pack
        # is static per problem — built once, cached on the patch level.
        from meshopticalflow_tpu.solvers.pallas_mg import (
            PallasMG3Solver, build_mg_pack)
        pack = patch.pallas_pack
        if pack is None:
            import numpy as np
            pack = build_mg_pack(np.asarray(basis.ell_cols),
                                 np.asarray(coarse.coarse_dev.ell_cols),
                                 coarse.p0,
                                 np.asarray(patch.p12_idx),
                                 np.asarray(patch.p12_wt),
                                 int(patch.s2_dense.shape[0]),
                                 cache_key=patch.artifact_key)
            patch.pallas_pack = pack
        c1_band = None
        if mg_coarse_exact:
            from meshopticalflow_tpu.solvers.pallas_mg import build_c1_band
            c1_band = patch.c1_band
            if c1_band is None:
                key = patch.artifact_key
                c1_band = build_c1_band(
                    pack, np.asarray(coarse.coarse_dev.ell_cols),
                    cache_key=(key + ".c1band") if key else "")
                patch.c1_band = c1_band
        solver = None
        if c1_band is not None:
            # With the exact banded c1 the dense patch coarsest is never
            # touched — skip assembling/uploading it entirely.
            solver = PallasMG3Solver(pack, sys_vals, diag, c_vals, c_diag,
                                     None, cheb_k=mg_cheb_k, nu=mg_nu,
                                     c1_band=c1_band,
                                     cheb_fine_deg=mg_fine_cheb,
                                     c1_bf16=mg_c1_bf16)
            if solver.c1_l_blocks is None:
                solver = None   # factorization breakdown: fall back
        if solver is None:
            a2 = patch_system_dense(patch.q2_idx, patch.q2_wt, d_blocks,
                                    scale, vf_smooth_weight,
                                    _patch_s2_device(patch))
            solver = PallasMG3Solver(pack, sys_vals, diag, c_vals, c_diag,
                                     a2, cheb_k=mg_cheb_k, nu=mg_nu)
        return solver
    if patch is not None:
        from meshopticalflow_tpu.solvers.mg3 import ThreeLevelSolver
        a2 = patch_system_dense(patch.q2_idx, patch.q2_wt, d_blocks, scale,
                                vf_smooth_weight, _patch_s2_device(patch))
        # Fine- and coarse-level matvecs dominate the on-device cycle;
        # revalue the RCM-tiled operators (ops/bsr.py, ~4.6x faster SpMV
        # than ELL on TPU for the edge-based flow patterns) from this
        # step's ELL system values. The pattern packs are static —
        # built once and cached on the patch level.
        fine_bsr = _tiled_operator(basis.ell_cols, sys_vals,
                                   patch, "flow_bsr")
        c1_bsr = _tiled_operator(coarse.coarse_dev.ell_cols, c_vals,
                                 patch, "flow_bsr_c1")
        return ThreeLevelSolver(basis.ell_cols, sys_vals, diag,
                                coarse.coarse_dev.ell_cols, c_vals,
                                coarse.p0_idx_dev, coarse.p0_wt_dev,
                                a2, patch.p12_idx, patch.p12_wt,
                                nu=4, fine_bsr=fine_bsr, c1_bsr=c1_bsr)
    from meshopticalflow_tpu.solvers.twolevel import TwoLevelSolver
    return TwoLevelSolver(basis.ell_cols, sys_vals, diag,
                          coarse.coarse_dev.ell_cols, c_vals,
                          coarse.p0_idx_dev, coarse.p0_wt_dev)


def update_optical_flow(
    basis: BasisDevice,
    coeffs: jnp.ndarray,
    d_blocks: jnp.ndarray,     # (T, 2, 2)
    rhs_t: jnp.ndarray,        # (T, 2)
    vf_smooth_weight: jnp.ndarray,
    cg_tol: float = 1e-7,
    cg_max_iters: int = 2000,
    cg_chunk: int = 128,
    use_host_cholesky: bool = False,
    refine: bool = True,
    coarse=None,   # models.coarse.CoarseSpace device handles (two-level MG)
    patch=None,    # models.coarse.PatchLevel (fully on-device 3-level MG)
    backend: str = "auto",  # flow SpMV backend: pallas | xla | auto
    mg_cheb_k: int = 1,     # Chebyshev order of the inner coarse-1 solve
    mg_coarse_exact: bool = False,  # banded-Cholesky exact c1 solve
    mg_c1_bf16: bool = False,  # store the c1 solve panels in bfloat16
    mg_nu: int = 2,         # Jacobi smoothing steps per MG half-cycle
    mg_fine_cheb: int = 0,  # Chebyshev fine-smoother degree (0 = Jacobi)
    refine_tol: float = 3e-9,
    refine_floor: float = 1e-5,
    x0=None,   # warm start for the flow solve (e.g. previous level's x)
    device_mesh=None,  # jax.sharding.Mesh for backend="halo"
    sched_key=None,    # pin refinement schedules PER LEVEL (later levels
                       # converge slower; one shared pin overshoots early
                       # levels and misses late ones)
    nd=None,   # solvers.multifrontal.NDContext: direct per-level solve
               # (flow_backend="mf"; falls back to MG on breakdown)
):
    """One Gauss-Newton flow step (VectorField::UpdateOpticalFlow,
    VectorField.h:46-104). Host-orchestrated: jitted system assembly,
    chunked ELL-PCG (bounded device time per dispatch), jitted finalize.

    ``use_host_cholesky`` switches the solve to a scipy sparse factorization
    on host — the correctness oracle mirroring the reference's
    EigenCholeskySolverLDLt (LinearSolvers.h:340-391). ``coarse`` enables the
    two-level geometric-multigrid PCG (solvers/twolevel.py).

    Returns (new_coeffs, tfield, solve_stats).
    """
    from meshopticalflow_tpu.solvers.cg import CGStats, ell_pcg

    LAST_FLOW_SOLVE["gb"] = None
    vf_smooth_weight = jnp.asarray(vf_smooth_weight, coeffs.dtype)
    sys_vals, dt_vals, rhs, diag, scale = build_flow_system(basis, d_blocks, rhs_t,
                                                            vf_smooth_weight)
    if use_host_cholesky:
        import numpy as np
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        n, w = basis.ell_cols.shape
        cols_h = np.asarray(basis.ell_cols).ravel()
        rows_h = np.repeat(np.arange(n), w)
        mat = sp.csc_matrix((np.asarray(sys_vals, np.float64).ravel(),
                             (rows_h, cols_h)), shape=(n, n))
        x_h = spla.spsolve(mat, np.asarray(rhs, np.float64))
        x = jnp.asarray(x_h, coeffs.dtype)
        stats = CGStats(jnp.asarray(0, jnp.int32), jnp.asarray(0.0, coeffs.dtype))
    elif coarse is not None or nd is not None:
        # Geometric MG-PCG (3-level fully on device when a patch level is
        # available, else 2-level with host coarse solves), wrapped in
        # mixed-precision iterative refinement for float64-grade residuals —
        # or, with an NDContext, the batched multifrontal DIRECT solve
        # (solvers/multifrontal.py): one numeric refactorization + three
        # 1-solve refinement rounds per level, MG as the breakdown fallback.
        from meshopticalflow_tpu.solvers.refine import refine_loop
        from meshopticalflow_tpu.kernels.pallas_spmv import resolve_flow_backend
        backend = resolve_flow_backend(backend, rhs.dtype)
        solver = _build_mg_solver = None
        if coarse is not None:
            def _build_mg_solver():
                return _make_mg_solver(
                    basis, coarse, patch, d_blocks, scale, vf_smooth_weight,
                    sys_vals, diag, backend, device_mesh, mg_cheb_k, mg_nu,
                    mg_fine_cheb, mg_coarse_exact, mg_c1_bf16)
        if nd is not None and device_mesh is None:
            from meshopticalflow_tpu.solvers.multifrontal import NDSolver
            solver = NDSolver(nd.pack, nd.levels_dev, sys_vals)
        if solver is None:
            solver = _build_mg_solver()
        def _run_solver(solver):
            # tol 3e-9 overall; per-round inner tolerance is adaptive with a
            # 3e-6 floor — each round then runs ~100 iterations and the
            # geometric contraction of refinement (x1e-3+/round) still lands
            # at 3e-9 in two or three rounds. Trajectory parity is protected
            # by the OUTER f64 residuals, not the inner tolerance (validated
            # on the reference Example at RMSE 0.115 vs the rebuilt binary).
            #
            # Dispatch economy (round 4): once a level of this problem has
            # measured its round schedule, later levels replay it as a
            # single async dispatch chain with ONE final accuracy fetch
            # (refine_fixed_pipelined) — the adaptive loop costs ~7 tunnel
            # round trips per level, the pinned schedule 2. A miss falls
            # back to the adaptive loop mid-solve and un-pins.
            if not refine:
                return solver.solve(rhs, x0=x0, tol=cg_tol,
                                    max_iters=min(cg_max_iters, 200))
            dsched = getattr(solver, "direct_schedule", None)
            if dsched is not None:
                # Direct multifrontal: the round schedule is known a priori
                # (three 1-solve rounds), so every level takes the two-fetch
                # pipelined path; the factorization fuses into round 1's
                # dispatch. A warm start is pointless against an exact
                # solve — x0 is ignored. Non-df32 backends (f64 CPU oracle
                # runs) use the adaptive loop with host f64 residuals.
                from meshopticalflow_tpu.solvers.df32 import df32_probe
                inner = lambda r, tol_inner, rn2=None: solver.solve(r)
                if (jnp.dtype(rhs.dtype) == jnp.float32
                        and df32_probe(jax.default_backend())):
                    from meshopticalflow_tpu.solvers.refine import \
                        refine_fixed_pipelined
                    x, stats, _ = refine_fixed_pipelined(
                        basis.ell_cols, sys_vals, rhs, solver.solve_fixed,
                        dsched, tol=refine_tol, inner_solve=inner,
                        inner_floor=refine_floor)
                    return x, stats
                return refine_loop(basis.ell_cols, sys_vals, rhs, inner,
                                   tol=refine_tol, inner_floor=refine_floor)
            sched = _flow_schedule_for(solver, rhs, x0, refine_tol,
                                       sched_key)
            if sched is not None:
                from meshopticalflow_tpu.solvers.refine import \
                    refine_fixed_pipelined
                x, stats, hit = refine_fixed_pipelined(
                    basis.ell_cols, sys_vals, rhs, solver.solve_fixed, sched,
                    tol=refine_tol,
                    inner_solve=lambda r, tol_inner, rn2=None: solver.solve(
                        r, tol=max(cg_tol, tol_inner),
                        max_iters=min(cg_max_iters, 120), b_norm2=rn2),
                    inner_floor=refine_floor)
                if not hit:
                    # Later levels converge slower (measured: level 3 needs
                    # ~120 iters where level 0 needed 96) — EXTEND the pin
                    # with the fallback's measured mop-up rounds instead of
                    # dropping it, so only the first slow level pays the
                    # adaptive fetches. An unsalvageable miss un-pins.
                    from meshopticalflow_tpu.solvers.refine import \
                        _LAST_ROUNDS
                    extra = tuple(_quantize_iters(int(n))
                                  for n, _ in _LAST_ROUNDS[0])
                    if (extra and len(sched) + len(extra) <= 4
                            and float(stats.rel_residual) <= 1.5 * refine_tol):
                        _store_schedule(solver, refine_tol, sched_key,
                                        tuple(sched) + extra)
                    else:
                        _FLOW_SCHED.pop(
                            ("flow", solver.pack_id, sched_key), None)
                        from meshopticalflow_tpu.utils.artifacts import \
                            drop_json
                        drop_json("sched", _sched_disk_key(
                            solver, refine_tol, sched_key))
                return x, stats
            x, stats = refine_loop(
                basis.ell_cols, sys_vals, rhs,
                lambda r, tol_inner, rn2=None: solver.solve(
                    r, tol=max(cg_tol, tol_inner),
                    max_iters=min(cg_max_iters, 120), b_norm2=rn2),
                tol=refine_tol, inner_floor=refine_floor, x0=x0)
            _maybe_pin_schedule(solver, stats, refine_tol, sched_key)
            return x, stats

        try:
            x, stats = _run_solver(solver)
            if getattr(solver, "direct_schedule", None) is not None:
                rel = float(stats.rel_residual)
                if not rel <= max(100 * refine_tol, 1e-7):
                    # f32 Cholesky breakdown (NaN factors) or an accuracy
                    # miss on a near-singular system: refactor under a
                    # relative diagonal shift (the banded c1's escalation
                    # contract); if that still misses, hand the level to
                    # the MG path.
                    from meshopticalflow_tpu.solvers.multifrontal import \
                        NDSolver
                    solver = NDSolver(nd.pack, nd.levels_dev, sys_vals,
                                      diag_slot=basis.diag_slot,
                                      shift_rel=1e-6)
                    x, stats = _run_solver(solver)
                    rel = float(stats.rel_residual)
                    if (not rel <= max(100 * refine_tol, 1e-7)
                            and _build_mg_solver is not None):
                        solver = _build_mg_solver()
                        x, stats = _run_solver(solver)
        except Exception as exc:
            from meshopticalflow_tpu.solvers.pallas_mg import (
                BandedBreakdownError)
            if not isinstance(exc, BandedBreakdownError):
                raise
            # Deferred banded c1 check failed at every shift mid-solve:
            # rebuild with the dense-patch coarsest (the pre-round-4 eager
            # path's fallback — _make_mg_solver without the exact-c1 flag
            # reuses the cached pattern pack) and redo the solve.
            solver = _make_mg_solver(
                basis, coarse, patch, d_blocks, scale, vf_smooth_weight,
                sys_vals, diag, backend, device_mesh, mg_cheb_k, mg_nu,
                mg_fine_cheb, False, mg_c1_bf16)
            x, stats = _run_solver(solver)
        LAST_FLOW_SOLVE["gb"] = (float(stats.iterations) * solver.gb_per_iter
                                 if hasattr(solver, "gb_per_iter") else None)
    elif refine:
        # Mixed-precision iterative refinement: reach float64-direct-solve
        # residual quality with f32 device CG (solvers/refine.py).
        from meshopticalflow_tpu.solvers.refine import ell_solve_refined
        x, stats = ell_solve_refined(basis.ell_cols, sys_vals, diag, rhs,
                                     inner_tol=max(cg_tol, 1e-6),
                                     inner_iters=cg_max_iters, chunk=cg_chunk,
                                     x0=x0)
    else:
        x, stats = ell_pcg(basis.ell_cols, sys_vals, diag, rhs, x0=x0,
                           tol=cg_tol, max_iters=cg_max_iters, chunk=cg_chunk)
    # Solved direction, readable by the caller right after this returns —
    # the pipeline feeds it back as next level's warm start (same reporting
    # pattern as the "gb" key above).
    LAST_FLOW_SOLVE["x"] = x
    new_coeffs, tfield = finalize_flow_step(basis, coeffs, x, dt_vals, rhs)
    return new_coeffs, tfield, stats
