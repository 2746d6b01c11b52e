"""On-chip nu sweep for the banded-exact Pallas MG flow solve.

Builds the real 2K level-0 Gauss-Newton system once, then times the full
refined flow solve (the production _stage_solve path) for a range of
smoothing counts nu. Prints one JSON line per (nu, repeat).

Usage: python scripts/exp_nu.py [atlas_size] [nus...]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nus = [int(a) for a in sys.argv[2:]] or [1, 2, 3, 4]

    from PIL import Image

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import (
        FlowProblem, _stage_resample, _stage_smooth, _stage_solve)

    tmpdir = "/tmp/meshflow_bench"
    os.makedirs(tmpdir, exist_ok=True)
    paths = []
    for name in ("A", "B"):
        src = f"/root/reference/Example/{name}.png"
        dst = os.path.join(tmpdir, f"{name}_{size}.png")
        if not os.path.exists(dst):
            img = Image.open(src).convert("RGB").resize((size, size),
                                                        Image.LANCZOS)
            img.save(dst)
        paths.append(dst)

    cfg = FlowConfig(levels=10)
    t0 = time.time()
    prob = FlowProblem.from_texture_inputs("/root/reference/Example/mesh.ply",
                                           tuple(paths), cfg)
    print(json.dumps({"init_s": round(time.time() - t0, 1)}), flush=True)

    smoothed, _ = _stage_smooth(prob.arrays,
                                jnp.asarray(cfg.scalar_smooth_weight,
                                            prob.dtype),
                                cfg, prob.vcoarse, prob.vpatch)
    d_blocks, rhs_t, align_err, _, _ = _stage_resample(
        prob.arrays, prob.tfield, smoothed, cfg)
    float(align_err)
    v_weight = jnp.asarray(cfg.resolved_vf_smooth_weight(), prob.dtype)

    for nu in nus:
        # negative entries sweep the Chebyshev FINE smoother degree
        if nu < 0:
            cfg_nu = dataclasses.replace(cfg, mg_fine_cheb=-nu)
        else:
            cfg_nu = dataclasses.replace(cfg, mg_nu=nu)
        for rep in range(3):
            t0 = time.time()
            coeffs, tfield, st = _stage_solve(
                prob.arrays, prob.coeffs, d_blocks, rhs_t, v_weight, cfg_nu,
                prob.coarse, prob.patch)
            tfield.block_until_ready()
            from meshopticalflow_tpu.solvers.refine import _LAST_ROUNDS
            print(json.dumps({
                "nu": nu, "rep": rep, "solve_s": round(time.time() - t0, 2),
                "iters": int(st.iterations), "rel": float(st.rel_residual),
                "rounds": "; ".join(f"{it}@{rel:.1e}"
                                    for it, rel in _LAST_ROUNDS[0]),
                "tnorm": float(jnp.linalg.norm(tfield))}), flush=True)


if __name__ == "__main__":
    main()
