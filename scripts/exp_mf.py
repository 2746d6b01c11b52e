"""On-chip multifrontal direct-solve microbenchmark at production scale.

Measures the real cost structure of solvers/multifrontal.py on the
tunneled TPU against the production flow-level systems (the exp_recycle
captures): pack build + upload, cold compile, warm numeric refactorization,
triangular solve, and a full refinement to the pipeline's 3e-9 outer
tolerance — the decision data for replacing the 96-126-iteration MG-PCG
per-level solve (VERDICT r3 next #2(b)).

Usage: python scripts/exp_mf.py [elength=0.006] [leaves=64] [levels=0,3,5,9]
Artifacts: bench_runs/round4_exp_mf_<date>.jsonl
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "bench_runs",
                   f"round4_exp_mf_{time.strftime('%Y-%m-%d')}.jsonl")
MESH = "/root/reference/Example/mesh.ply"
CAP_DIR = "/tmp/exp_recycle_cap"


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def load_problem(elength):
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.models.base import BasisDevice
    from meshopticalflow_tpu.utils.artifacts import cache_dir, file_hash, key_of

    import jax.numpy as jnp

    mesh_hash = file_hash(MESH)
    geo_key = key_of("geom", mesh_hash, elength)
    gd = np.load(os.path.join(cache_dir(), f"geom-{geo_key}.npz"),
                 allow_pickle=False)
    cfg = FlowConfig(subdivide_edge_length=elength)
    bk = key_of("basis", geo_key, int(cfg.vf_mode), int(cfg.connection_mode),
                cfg.divergence_free)
    bd = np.load(os.path.join(cache_dir(), f"basis-{bk}.npz"),
                 allow_pickle=False)
    dev = BasisDevice(
        p_idx=jnp.asarray(bd["p_idx"], jnp.int32),
        p_wt=jnp.asarray(bd["p_wt"], jnp.float32),
        ell_cols=jnp.asarray(bd["ell_cols"]),
        s_vals=jnp.asarray(bd["s_vals"], jnp.float32),
        diag_slot=jnp.asarray(bd["diag_slot"]),
        dt_slots=jnp.asarray(bd["dt_slots"]),
        n_coeffs=int(bd["n_coeffs"]))
    from meshopticalflow_tpu.solvers.multifrontal import dof_positions
    pos = dof_positions(gd["tris"], gd["verts"], bd["p_idx"],
                        int(bd["n_coeffs"]))
    return dev, np.asarray(bd["ell_cols"]), pos, bk


def load_capture(elength, lv):
    for name in (f"e{elength}_level{lv:02d}.npz", f"level{lv:02d}.npz"):
        p = os.path.join(CAP_DIR, name)
        if os.path.exists(p):
            return np.load(p)
    raise SystemExit(f"no capture for level {lv}; run exp_recycle capture")


def host_csr(ell_cols, sys_vals):
    import scipy.sparse as sp
    n, w = ell_cols.shape
    return sp.csr_matrix(
        (np.asarray(sys_vals, np.float64).ravel(),
         (np.repeat(np.arange(n), w), ell_cols.astype(np.int64).ravel())),
        shape=(n, n))


def main():
    elength = float(sys.argv[1]) if len(sys.argv) > 1 else 0.006
    leaves = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                               else ["64"])]
    levels = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                               else ["0", "3", "5", "9"])]

    import jax
    import jax.numpy as jnp
    from meshopticalflow_tpu.models.base import build_flow_system
    from meshopticalflow_tpu.solvers.multifrontal import (
        NDSolver, build_nd_pack)
    from meshopticalflow_tpu.solvers.refine import (_LAST_ROUNDS,
                                                    refine_loop)
    from meshopticalflow_tpu.utils.artifacts import key_of

    emit({"exp": "mf", "backend": jax.default_backend(),
          "elength": elength, "leaves": leaves, "levels": levels})

    t0 = time.time()
    dev, ell_cols_h, pos, bk = load_problem(elength)
    emit({"load_s": round(time.time() - t0, 1), "n": int(ell_cols_h.shape[0]),
          "w": int(ell_cols_h.shape[1])})

    for leaf in leaves:
        t0 = time.time()
        pack = build_nd_pack(ell_cols_h, pos, leaf=leaf,
                             cache_key=key_of("ndpack", bk, leaf))
        build_s = time.time() - t0
        table_mb = sum(dt.rows.nbytes + dt.loc.nbytes + dt.child_idx.nbytes
                       + dt.child_map.nbytes + dt.pad_elim.nbytes
                       for dt in pack.levels) / 1e6
        emit({"leaf": leaf, "pack_build_s": round(build_s, 1),
              "table_mb": round(table_mb, 1), **pack.stats})

        t0 = time.time()
        levels_dev = pack.device()
        jax.block_until_ready(levels_dev)
        up_s = time.time() - t0
        emit({"upload_s": round(up_s, 2),
              "upload_mbps": round(table_mb / max(up_s, 1e-9), 1)})

        first = True
        for lv in levels:
            cap = load_capture(elength, lv)
            d_blocks = jnp.asarray(cap["d_blocks"], jnp.float32)
            rhs_t = jnp.asarray(cap["rhs_t"], jnp.float32)
            vw = jnp.asarray(float(cap["v_weight"]), jnp.float32)
            sys_vals, _, rhs, _, _ = build_flow_system(dev, d_blocks, rhs_t, vw)
            jax.block_until_ready((sys_vals, rhs))

            solver = NDSolver(pack, levels_dev, sys_vals)
            t0 = time.time()
            solver.factor()
            jax.block_until_ready(solver.factors)
            factor_s = time.time() - t0

            t0 = time.time()
            x1 = solver.solve_direct(rhs)
            jax.block_until_ready(x1)
            solve1_s = time.time() - t0
            t0 = time.time()
            x2 = solver.solve_direct(rhs)
            jax.block_until_ready(x2)
            solve2_s = time.time() - t0

            # Full production-style refinement to the pipeline tolerance.
            solver2 = NDSolver(pack, levels_dev, sys_vals)
            t0 = time.time()
            x, stats = refine_loop(
                dev.ell_cols, sys_vals, rhs,
                lambda r, tol, rn2=None: solver2.solve(r, tol, None, rn2),
                tol=3e-9, inner_floor=1e-6)
            jax.block_until_ready(x)
            refine_s = time.time() - t0

            # Host f64 oracle residual (once per level; uses f32 sys cast).
            a = host_csr(ell_cols_h, np.asarray(sys_vals))
            b = np.asarray(rhs, np.float64)
            rel_true = float(np.linalg.norm(a @ np.asarray(x, np.float64) - b)
                             / np.linalg.norm(b))

            mem = {}
            try:
                st = jax.local_devices()[0].memory_stats() or {}
                mem = {k.replace("bytes", "mb"): round(st[k] / 2**20)
                       for k in ("bytes_in_use", "peak_bytes_in_use")
                       if k in st}
            except Exception:
                pass
            emit({"leaf": leaf, "level": lv, "cold": first,
                  "factor_s": round(factor_s, 3),
                  "solve1_s": round(solve1_s, 3),
                  "solve2_s": round(solve2_s, 3),
                  "refine_s": round(refine_s, 3),
                  "refine_rounds": [int(n) for n, _ in _LAST_ROUNDS[0]],
                  "rel_df32": float(stats.rel_residual),
                  "rel_true_f64": rel_true, **mem})
            first = False


if __name__ == "__main__":
    main()
