"""Refinement-tolerance sweep on the 2K north-star workload.

The reference solves every Gauss-Newton system exactly (f64 Cholesky,
/root/reference/include/Misha/LinearSolvers.h:294-335); this framework
approximates that with mixed-precision iterative refinement to
``flow_refine_tol`` (config.py). The sweep measures how much accuracy the
2K output actually loses as the outer target is loosened — if the result
PNG stays within the measured parity band (RMSE 0.152/255 vs the rebuilt
reference binary, PARITY_2K.json), looser defaults buy their solve time
for free.

Usage (TPU):  python scripts/exp_tol.py [tol ...]
Compares each run's result PNG against /tmp/parity2k/ref_result_2048.png
(produced once by the rebuilt reference binary) and prints one JSON line
per tolerance.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    tols = [float(t) for t in sys.argv[1:]] or [3e-9, 1e-7, 1e-6, 1e-5]

    from PIL import Image

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem

    ref_png_path = "/tmp/parity2k/ref_result_2048.png"
    ref = (np.asarray(Image.open(ref_png_path), np.float64)[..., :3]
           if os.path.exists(ref_png_path) else None)
    paths = ("/tmp/meshflow_bench/A_2048.png", "/tmp/meshflow_bench/B_2048.png")

    for tol in tols:
        cfg = FlowConfig(levels=10, flow_refine_tol=tol)
        t0 = time.time()
        prob = FlowProblem.from_texture_inputs(
            "/root/reference/Example/mesh.ply", paths, cfg)
        init_s = time.time() - t0
        t0 = time.time()
        res = prob.run(verbose=False)
        levels_s = time.time() - t0
        t0 = time.time()
        img = prob.halfway_texture()
        out_s = time.time() - t0
        rec = {
            "flow_refine_tol": tol,
            "init_s": round(init_s, 2),
            "levels_s": round(levels_s, 2),
            "out_s": round(out_s, 2),
            "solve_s": [round(m.get("solve_seconds", 0.0), 2)
                        for m in res.metrics],
            "alignment_error": round(float(res.metrics[-1]["alignment_error"]), 4),
        }
        if ref is not None:
            ours = np.asarray(img, np.float64)[..., :3]
            rec["rmse_vs_reference_255"] = round(
                float(np.sqrt(np.mean((ours - ref) ** 2))), 4)
            rec["frac_within_1"] = round(
                float(np.mean(np.abs(ours - ref) <= 1.0)), 5)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
