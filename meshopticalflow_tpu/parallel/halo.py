"""Halo-exchange sharded SpMV — the chart-aligned communication design of
SURVEY.md §7 step 6 / §2.7.

The GSPMD row-sharded ELL matvec all-gathers the FULL x vector on every
device per matvec (N floats over ICI each iteration). But mesh operators
are local: after reverse-Cuthill-McKee ordering, every column referenced
by row r lies within the semiband s of r (s ~ 4.4k at the 2K bench's
N=325k flow system). Partitioning the RCM-ordered rows into contiguous
per-device blocks therefore makes all cross-device references fall in a
halo of s rows at each block boundary — the intrinsic-chart analog of a
structured-grid ghost layer. Each matvec then exchanges only 2*H floats
per device boundary via ``lax.ppermute`` (nearest-neighbor ICI traffic,
~37x less than the all-gather at bench scale) and runs a purely local
gather + multiply.

Usage::

    h = build_halo_ell(cols, vals, mesh)      # host prep, static per pattern
    y = h.matvec(x)                           # original row order in/out
    x, stats = halo_pcg(h, b, tol=1e-7)       # Jacobi-PCG on the halo matvec

The permutation in/out of RCM order is paid once per solve (entry/exit),
not per matvec — solves run entirely in permuted space.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class HaloEll:
    """Static halo-exchange layout for one padded-ELL pattern on a mesh."""

    mesh: Mesh
    axis: str
    perm: jnp.ndarray          # (n,) RCM new -> old
    inv_perm: jnp.ndarray      # (n,) old -> new
    cols_local: jnp.ndarray    # (Np, W) halo-local indices, row-sharded
    vals_p: jnp.ndarray        # (Np, W) values in permuted row order, sharded
    diag_p: jnp.ndarray        # (Np,) diagonal in permuted order, sharded
    n: int                     # true dimension
    block: int                 # rows per device
    halo: int                  # halo rows per side

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y = A x with x, y in ORIGINAL row order."""
        xp = self._to_p(x)
        yp = self.matvec_p(xp)
        return yp[: self.n][self.inv_perm]

    def _to_p(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.block * self.mesh.devices.size - self.n
        xp = x[self.perm]
        if pad:
            xp = jnp.concatenate([xp, jnp.zeros(pad, x.dtype)])
        return jax.device_put(xp, NamedSharding(self.mesh, P(self.axis)))

    def matvec_p(self, xp: jnp.ndarray) -> jnp.ndarray:
        """y = A x entirely in permuted (sharded) space."""
        return _halo_matvec(self.mesh, self.axis, self.halo,
                            self.cols_local, self.vals_p, xp)


def _halo_matvec(mesh: Mesh, axis: str, halo: int, cols_local, vals_p, xp):
    from jax import shard_map  # jax>=0.8 top-level API

    n_dev = mesh.devices.size
    fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(axis, None), P(axis, None), P(axis)),
                       out_specs=P(axis))
    def run(cols_l, vals_l, x_l):
        b = x_l.shape[0]
        # Neighbor halos: my right edge becomes my right neighbor's left
        # halo (forward shift) and vice versa. Wrap-around data on the
        # outermost devices is never referenced (no row couples across the
        # band ends); the clip below only guards the ELL pad slots, whose
        # values are 0.
        left_halo = lax.ppermute(x_l[-halo:], axis, fwd)
        right_halo = lax.ppermute(x_l[:halo], axis, bwd)
        x_ext = jnp.concatenate([left_halo, x_l, right_halo])
        idx = jnp.clip(cols_l, 0, b + 2 * halo - 1)
        return jnp.sum(vals_l * x_ext[idx], axis=1)

    return run(cols_local, vals_p, xp)


def build_halo_ell(cols: np.ndarray, vals, mesh: Mesh, axis: str = "dp",
                   diag: Optional[np.ndarray] = None,
                   perm: Optional[np.ndarray] = None) -> HaloEll:
    """Host prep: RCM-order the pattern, partition rows contiguously over
    the mesh axis, and rewrite column indices into halo-local coordinates.

    Requires the RCM semiband to fit in one block (s <= N/devices) — true
    for mesh operators at any realistic rows-per-device; raises otherwise
    (the caller should fall back to the GSPMD all-gather path).
    """
    import scipy.sparse as sp

    cols = np.asarray(cols)
    n, w = cols.shape
    n_dev = mesh.devices.size
    if perm is None:
        rows = np.repeat(np.arange(n, dtype=np.int64), w)
        pattern = sp.csr_matrix(
            (np.ones(n * w, np.float32), (rows, cols.astype(np.int64).ravel())),
            shape=(n, n))
        perm = np.asarray(sp.csgraph.reverse_cuthill_mckee(
            pattern, symmetric_mode=True), np.int64)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)

    block = -(-n // n_dev)
    # Halo sizing wants the semiband; pad rows (self-referencing, value 0)
    # keep every block full.
    cols_p = inv[cols[perm]]                      # (n, w) permuted space
    semiband = int(np.max(np.abs(cols_p - np.arange(n)[:, None]))) if n else 0
    if semiband > block:
        raise ValueError(
            f"RCM semiband {semiband} exceeds rows-per-device {block}; "
            "use the all-gather path")
    halo = max(semiband, 1)   # >= 1 so the edge slices are never 0-width
    n_pad = block * n_dev
    vals_h = np.asarray(vals, np.float64)[perm]
    if n_pad > n:
        pad_rows = np.arange(n, n_pad)
        cols_p = np.concatenate([cols_p, np.repeat(pad_rows[:, None], w, 1)])
        vals_h = np.concatenate([vals_h, np.zeros((n_pad - n, w))])
    row_block = np.arange(n_pad)[:, None] // block
    cols_local = cols_p - (row_block * block - halo)

    if diag is None:
        diag_p = np.zeros(n_pad)
        match = cols_p == np.arange(n_pad)[:, None]
        diag_p = (np.asarray(vals_h) * match).sum(axis=1)
    else:
        diag_p = np.concatenate([np.asarray(diag, np.float64)[perm],
                                 np.zeros(n_pad - n)])

    dtype = jnp.asarray(vals).dtype
    row = NamedSharding(mesh, P(axis, None))
    vec = NamedSharding(mesh, P(axis))
    return HaloEll(
        mesh=mesh, axis=axis,
        perm=jnp.asarray(perm, jnp.int32),
        inv_perm=jnp.asarray(inv, jnp.int32),
        cols_local=jax.device_put(jnp.asarray(cols_local, jnp.int32), row),
        vals_p=jax.device_put(jnp.asarray(vals_h, dtype), row),
        diag_p=jax.device_put(jnp.asarray(diag_p, dtype), vec),
        n=n, block=block, halo=halo)


@dataclasses.dataclass
class HaloCoarse:
    """Replicated exact coarse correction for ``halo_mg_pcg`` — the
    production solver's 2-level algorithm (nu-step damped-Jacobi smoothing
    around an EXACT banded-Cholesky coarse solve, solvers/pallas_mg.py
    _cycle_exact) restated for the halo-sharded layout.

    The fine rows are sharded; the coarse space (n1 ~ 60k at bench scale,
    0.24 MB f32) is REPLICATED: restriction scatters local partial sums and
    GSPMD all-reduces them, every device runs the identical panelized
    banded solve, and prolongation gathers from the replicated result —
    the classic replicated-coarse strategy (coarse work is < 2% of cycle
    traffic, so redundancy beats communication)."""

    p0_idx_p: jnp.ndarray    # (n_pad, K0) c1 column per PERMUTED fine row
    p0_wt_p: jnp.ndarray     # (n_pad, K0) weights (0 on pad rows)
    dinv: jnp.ndarray        # panelized banded factor of the c1 system
    pbelow: jnp.ndarray      # (build_solve_panels), replicated
    bperm: jnp.ndarray
    binv_perm: jnp.ndarray
    n1: int


def _permute_pad_p0(h: HaloEll, p0_idx, p0_wt):
    """RCM-permute the prolongation gather into the halo row order,
    zero-pad to the sharded row count, and upload row-sharded."""
    perm = np.asarray(h.perm)
    n_pad = h.block * h.mesh.devices.size
    idx_p = np.asarray(p0_idx)[perm]
    wt_p = np.asarray(p0_wt)[perm]
    if n_pad > h.n:
        k0 = idx_p.shape[1]
        idx_p = np.concatenate([idx_p,
                                np.zeros((n_pad - h.n, k0), np.int64)])
        wt_p = np.concatenate([wt_p,
                               np.zeros((n_pad - h.n, k0), wt_p.dtype)])
    row = NamedSharding(h.mesh, P(h.axis, None))
    return (jax.device_put(jnp.asarray(idx_p, jnp.int32), row),
            jax.device_put(jnp.asarray(wt_p, h.vals_p.dtype), row))


def build_halo_coarse(h: HaloEll, p0_idx: np.ndarray, p0_wt,
                      c1_cols: np.ndarray, c1_vals) -> HaloCoarse:
    """Permute the prolongation gather into the halo row order and factor
    the c1 system (banded Cholesky, panelized solves)."""
    from meshopticalflow_tpu.solvers.banded import (BandedCholeskySolver,
                                                    build_band_pattern)

    idx_p, wt_p = _permute_pad_p0(h, p0_idx, p0_wt)
    solver = BandedCholeskySolver(build_band_pattern(np.asarray(c1_cols)))
    solver.factor(jnp.asarray(c1_vals, jnp.float32))
    return HaloCoarse(
        p0_idx_p=idx_p, p0_wt_p=wt_p,
        dinv=solver.dinv, pbelow=solver.pbelow,
        bperm=solver.perm, binv_perm=solver.inv_perm, n1=solver.pat.n)


def _halo_cycle(h_static, hc_static, cols_local, vals_p, inv_d, p0_idx_p,
                p0_wt_p, dinv, pbelow, bperm, binv_perm, r, omega, nu: int):
    """Symmetric 2-level V-cycle on the halo layout (GSPMD level; only the
    fine matvec is an explicit shard_map)."""
    from meshopticalflow_tpu.solvers.banded import band_solve_panels

    mesh, axis, halo = h_static
    n1 = hc_static

    def mv(v):
        return _halo_matvec(mesh, axis, halo, cols_local, vals_p, v)

    z = omega * inv_d * r
    for _ in range(nu - 1):
        z = z + omega * inv_d * (r - mv(z))
    res = r - mv(z)
    r1 = jnp.zeros(n1, res.dtype).at[p0_idx_p.ravel()].add(
        (p0_wt_p * res[:, None]).ravel())
    z1 = band_solve_panels(dinv, pbelow, bperm, binv_perm, r1,
                           n1).astype(res.dtype)
    z = z + jnp.sum(p0_wt_p * z1[p0_idx_p], axis=1)
    for _ in range(nu):
        z = z + omega * inv_d * (r - mv(z))
    return z


@functools.partial(jax.jit, static_argnames=("h_static", "hc_static",
                                             "iters", "nu"))
def _halo_mg_pcg_chunk(h_static, hc_static, cols_local, vals_p, inv_d,
                       p0_idx_p, p0_wt_p, dinv, pbelow, bperm, binv_perm,
                       x, r, z, p, rz, omega, iters: int, nu: int):
    mesh, axis, halo = h_static

    def body(_, s):
        x, r, z, p, rz = s
        ap = _halo_matvec(mesh, axis, halo, cols_local, vals_p, p)
        pap = jnp.vdot(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = _halo_cycle(h_static, hc_static, cols_local, vals_p, inv_d,
                        p0_idx_p, p0_wt_p, dinv, pbelow, bperm, binv_perm,
                        r, omega, nu)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, z, p, rz_new)

    x, r, z, p, rz = lax.fori_loop(0, iters, body, (x, r, z, p, rz))
    return x, r, z, p, rz, jnp.vdot(r, r)


def halo_mg_pcg(h: HaloEll, hc: HaloCoarse, b: jnp.ndarray,
                tol: float = 1e-7, max_iters: int = 2000, chunk: int = 32,
                omega: float = 0.7, nu: int = 2, x0=None, b_norm2=None):
    """PCG over the halo matvec preconditioned by the PRODUCTION 2-level
    cycle (damped-Jacobi smoothing + exact banded c1 solve) — the sharded
    form of the solver the 2K bench runs, converging in the same tens of
    iterations instead of plain Jacobi-PCG's hundreds. b and the result
    are in ORIGINAL row order. ``b_norm2``, when the caller already knows
    ||b||^2 (refinement does), skips one device fetch."""
    from meshopticalflow_tpu.solvers.cg import CGStats

    bp = h._to_p(b)
    b2 = float(b_norm2) if b_norm2 is not None else float(jnp.vdot(bp, bp))
    if b2 == 0:
        return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                          jnp.asarray(0.0, b.dtype))
    inv_d = jnp.where(h.diag_p != 0, 1.0 / jnp.where(h.diag_p != 0,
                                                     h.diag_p, 1.0), 0.0)
    h_static = (h.mesh, h.axis, h.halo)
    omega_a = jnp.asarray(omega, bp.dtype)
    if x0 is not None:
        x = h._to_p(jnp.asarray(x0, bp.dtype))
        r = bp - h.matvec_p(x)
    else:
        x = jnp.zeros_like(bp)
        r = bp
    z = _halo_cycle(h_static, hc.n1, h.cols_local, h.vals_p, inv_d,
                    hc.p0_idx_p, hc.p0_wt_p, hc.dinv, hc.pbelow, hc.bperm,
                    hc.binv_perm, r, omega_a, nu)
    p = z
    rz = jnp.vdot(r, z)
    threshold = (tol ** 2) * b2
    done, r2 = 0, b2
    while done < max_iters and r2 > threshold:
        iters = min(chunk, max_iters - done)
        x, r, z, p, rz, r2_dev = _halo_mg_pcg_chunk(
            h_static, hc.n1, h.cols_local, h.vals_p, inv_d, hc.p0_idx_p,
            hc.p0_wt_p, hc.dinv, hc.pbelow, hc.bperm, hc.binv_perm,
            x, r, z, p, rz, omega_a, iters, nu)
        r2 = float(r2_dev)
        done += iters
    rel = float(np.sqrt(max(r2, 0.0) / b2))
    out = x[: h.n][h.inv_perm].astype(b.dtype)
    return out, CGStats(jnp.asarray(done, jnp.int32),
                        jnp.asarray(rel, b.dtype))


class HaloFlowSolver:
    """The flow-solve adapter for ``flow_backend="halo"``: same ``solve``
    signature as the single-device MG solvers, so ``update_optical_flow``
    wraps it in the usual iterative refinement."""

    def __init__(self, h: HaloEll, hc: HaloCoarse, omega: float = 0.7,
                 nu: int = 2):
        self.h, self.hc, self.omega, self.nu = h, hc, omega, nu

    def solve(self, b, tol: float = 1e-7, max_iters: int = 200, x0=None,
              b_norm2=None):
        return halo_mg_pcg(self.h, self.hc, b, tol=tol, max_iters=max_iters,
                           omega=self.omega, nu=self.nu, x0=x0,
                           b_norm2=b_norm2)


# Static halo layout cache keyed by the fine ELL cols array identity
# (weakref-guarded against id recycling, bounded) — the RCM ordering,
# halo-local column rewrite, permuted prolongation gather, and c1 band
# pattern are per-problem; only the VALUES change per Gauss-Newton level.
_FLOW_HALO_CACHE: dict = {}


def flow_halo_solver(device_mesh: Mesh, cols, sys_vals, diag, c1_cols,
                     c1_vals, p0_idx, p0_wt, nu: int = 2) -> HaloFlowSolver:
    """Build (or revalue) the halo-sharded 2-level flow solver for one
    Gauss-Newton level."""
    import weakref

    from meshopticalflow_tpu.solvers.banded import (BandedCholeskySolver,
                                                    build_band_pattern)

    axis = device_mesh.axis_names[0]
    key = id(cols)
    ent = _FLOW_HALO_CACHE.get(key)
    if ent is None or ent["ref"]() is not cols or ent["mesh"] is not device_mesh:
        h = build_halo_ell(np.asarray(cols), jnp.asarray(sys_vals),
                           device_mesh, axis=axis, diag=np.asarray(diag))
        pat1 = build_band_pattern(np.asarray(c1_cols))
        idx_p, wt_p = _permute_pad_p0(h, p0_idx, p0_wt)
        ent = {"ref": weakref.ref(cols), "mesh": device_mesh, "h": h,
               "pat1": pat1, "p0_idx_p": idx_p, "p0_wt_p": wt_p}
        _FLOW_HALO_CACHE[key] = ent
        if len(_FLOW_HALO_CACHE) > 4:
            _FLOW_HALO_CACHE.pop(next(iter(_FLOW_HALO_CACHE)))
    else:
        h = _revalue_halo(ent["h"], sys_vals, diag)
        ent["h"] = h
    solver1 = BandedCholeskySolver(ent["pat1"]).factor(
        jnp.asarray(c1_vals, jnp.float32))
    hc = HaloCoarse(p0_idx_p=ent["p0_idx_p"], p0_wt_p=ent["p0_wt_p"],
                    dinv=solver1.dinv, pbelow=solver1.pbelow,
                    bperm=solver1.perm, binv_perm=solver1.inv_perm,
                    n1=solver1.pat.n)
    return HaloFlowSolver(ent["h"], hc, nu=nu)


def _revalue_halo(h: HaloEll, vals, diag) -> HaloEll:
    """New level values on the cached static halo layout."""
    n_pad = h.block * h.mesh.devices.size
    vals_p = jnp.asarray(vals)[h.perm]
    diag_p = jnp.asarray(diag)[h.perm]
    if n_pad > h.n:
        vals_p = jnp.concatenate(
            [vals_p, jnp.zeros((n_pad - h.n, vals_p.shape[1]), vals_p.dtype)])
        diag_p = jnp.concatenate(
            [diag_p, jnp.zeros(n_pad - h.n, diag_p.dtype)])
    row = NamedSharding(h.mesh, P(h.axis, None))
    vec = NamedSharding(h.mesh, P(h.axis))
    return dataclasses.replace(h, vals_p=jax.device_put(vals_p, row),
                               diag_p=jax.device_put(diag_p, vec))


@functools.partial(jax.jit, static_argnames=("h_static", "iters"))
def _halo_pcg_chunk(h_static, cols_local, vals_p, inv_d, x, r, z, p, rz,
                    iters: int):
    mesh, axis, halo = h_static

    def body(_, s):
        x, r, z, p, rz = s
        ap = _halo_matvec(mesh, axis, halo, cols_local, vals_p, p)
        pap = jnp.vdot(p, ap)
        alpha = jnp.where(pap != 0, rz / jnp.where(pap != 0, pap, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = inv_d * r
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta * p
        return (x, r, z, p, rz_new)

    x, r, z, p, rz = lax.fori_loop(0, iters, body, (x, r, z, p, rz))
    return x, r, z, p, rz, jnp.vdot(r, r)


def halo_pcg(h: HaloEll, b: jnp.ndarray, tol: float = 1e-7,
             max_iters: int = 2000, chunk: int = 128):
    """Jacobi-preconditioned CG on the halo-exchange matvec; b and the
    result are in ORIGINAL row order. The CG dot products are global psums
    over the mesh (inserted by GSPMD); the matvecs exchange only halos."""
    from meshopticalflow_tpu.solvers.cg import CGStats

    bp = h._to_p(b)
    b2 = float(jnp.vdot(bp, bp))
    if b2 == 0:
        return jnp.zeros_like(b), CGStats(jnp.asarray(0, jnp.int32),
                                          jnp.asarray(0.0, b.dtype))
    inv_d = jnp.where(h.diag_p != 0, 1.0 / jnp.where(h.diag_p != 0,
                                                     h.diag_p, 1.0), 0.0)
    x = jnp.zeros_like(bp)
    r = bp
    z = inv_d * r
    p = z
    rz = jnp.vdot(r, z)
    h_static = (h.mesh, h.axis, h.halo)
    threshold = (tol ** 2) * b2
    done, r2 = 0, b2
    while done < max_iters and r2 > threshold:
        iters = min(chunk, max_iters - done)
        x, r, z, p, rz, r2_dev = _halo_pcg_chunk(
            h_static, h.cols_local, h.vals_p, inv_d, x, r, z, p, rz, iters)
        r2 = float(r2_dev)
        done += iters
    rel = float(np.sqrt(max(r2, 0.0) / b2))
    out = x[: h.n][h.inv_perm].astype(b.dtype)
    return out, CGStats(jnp.asarray(done, jnp.int32),
                        jnp.asarray(rel, b.dtype))
