"""Per-stage wall-time profile of the flow pipeline on the live device.

Usage: python scripts/profile_level.py [atlas_size] [levels]

Prints JSON lines: init breakdown, then per-level stage timings
(smooth / trace+dataterm / flow-solve), then advect. On the tunneled TPU
runtime per-dispatch timing under-reads (see PROGRESS.md); stage boundaries
here each end in a host fetch, which is reliable.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from PIL import Image

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import (
        FlowProblem, _stage_smooth, _stage_resample, _stage_solve)

    tmpdir = "/tmp/meshflow_bench"
    os.makedirs(tmpdir, exist_ok=True)
    paths = []
    for name in ("A", "B"):
        src = f"/root/reference/Example/{name}.png"
        dst = os.path.join(tmpdir, f"{name}_{size}.png")
        if not os.path.exists(dst):
            img = Image.open(src).convert("RGB").resize((size, size), Image.LANCZOS)
            img.save(dst)
        paths.append(dst)

    cfg = FlowConfig(levels=levels)
    stages = {}
    t_all = time.time()
    t0 = time.time()
    prob = FlowProblem.from_texture_inputs("/root/reference/Example/mesh.ply",
                                           tuple(paths), cfg)
    stages["init_s"] = time.time() - t0
    print(json.dumps({"init_s": round(stages["init_s"], 2),
                      "tris": prob.mesh.n_triangles,
                      "verts": prob.mesh.n_vertices,
                      "coeffs": prob.arrays.basis.n_coeffs,
                      "init_profile": prob.init_profile}), flush=True)

    coeffs, tfield = prob.coeffs, prob.tfield
    s_weight = cfg.scalar_smooth_weight
    v_weight = cfg.resolved_vf_smooth_weight()
    for level in range(levels):
        rec = {"level": level}
        t0 = time.time()
        smoothed, sm_stats = _stage_smooth(
            prob.arrays, jnp.asarray(s_weight, prob.dtype), cfg,
            prob.vcoarse, prob.vpatch)
        smoothed.block_until_ready()
        rec["smooth_s"] = round(time.time() - t0, 2)
        rec["smooth_iters"] = int(sm_stats.iterations)

        t0 = time.time()
        d_blocks, rhs_t, align_err, _, _ = _stage_resample(prob.arrays, tfield, smoothed, cfg)
        float(align_err)
        rec["resample_s"] = round(time.time() - t0, 2)

        from meshopticalflow_tpu.solvers import pallas_mg
        from meshopticalflow_tpu.solvers import refine as refine_mod
        pallas_mg._LAST_TRAIL["chunks"] = []
        pallas_mg._LAST_TRAIL["factor_s"] = None
        t0 = time.time()
        coeffs, tfield, cg_stats = _stage_solve(
            prob.arrays, coeffs, d_blocks, rhs_t,
            jnp.asarray(v_weight, prob.dtype), cfg, prob.coarse, prob.patch)
        tfield.block_until_ready()
        rec["solve_s"] = round(time.time() - t0, 2)
        rec["flow_iters"] = int(cg_stats.iterations)
        # Dispatch/fetch attribution: per-chunk (iters, seconds) with round
        # markers, the banded factor time, and the refinement round trail.
        rec["solve_trail"] = pallas_mg._LAST_TRAIL["chunks"]
        rec["factor_s"] = pallas_mg._LAST_TRAIL["factor_s"]
        rec["refine_rounds"] = refine_mod._LAST_ROUNDS[0]
        rec["align_err"] = float(align_err)
        print(json.dumps(rec), flush=True)
        s_weight *= cfg.scalar_weight_multiplier
        if v_weight * cfg.vf_weight_multiplier > cfg.vf_smooth_weight_threshold:
            v_weight = v_weight * cfg.vf_weight_multiplier

    prob.coeffs, prob.tfield = coeffs, tfield
    t0 = time.time()
    prob.halfway_texture()   # the production output stage (device blend)
    out1 = round(time.time() - t0, 2)
    t0 = time.time()
    prob.halfway_texture()   # warm repeat (march + blend + one u8 fetch)
    print(json.dumps({"output_s": out1, "output_warm_s": round(time.time() - t0, 2),
                      "total_s": round(time.time() - t_all, 2)}), flush=True)


if __name__ == "__main__":
    main()
