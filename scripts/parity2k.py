"""2K-scale parity evidence vs the rebuilt reference binary (VERDICT r2 #6).

Phase "ours":   run this framework on the 2048^2 north-star workload with
                --debug dumps and the result PNG (TPU; ~4-10 min warm).
Phase "compare": pixel RMSE of the result PNGs + per-level RMSE of the
                resampled.{S,T}.<level>.ply debug dumps (the per-vertex
                signals advected by each level's flow — the practical flow-
                endpoint agreement check, since the reference never dumps
                the field itself).

Usage:
    python scripts/parity2k.py ours   [out_dir=/tmp/parity2k/ours]
    python scripts/parity2k.py compare [ref_dir=/tmp/parity2k] [ours_dir=...]

The reference side is produced once with the rebuilt binary:
    /tmp/refOpticalFlow --mesh Example/mesh.ply \
        --in A_2048.png B_2048.png --out ref_result_2048.png --debug
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_ours(out_dir="/tmp/parity2k/ours"):
    os.makedirs(out_dir, exist_ok=True)
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem

    paths = ("/tmp/meshflow_bench/A_2048.png", "/tmp/meshflow_bench/B_2048.png")
    cfg = FlowConfig(levels=10)
    prob = FlowProblem.from_texture_inputs("/root/reference/Example/mesh.ply",
                                           paths, cfg)
    res = prob.run(verbose=True, debug_dir=out_dir)
    prob.write_output(os.path.join(out_dir, "result_2048.png"))
    print(json.dumps({"final_alignment_error":
                      float(res.metrics[-1]["alignment_error"])}))


def compare(ref_dir="/tmp/parity2k", ours_dir="/tmp/parity2k/ours"):
    from PIL import Image

    from meshopticalflow_tpu.io.ply import read_triangle_mesh

    out = {}
    ref_png = np.asarray(Image.open(os.path.join(
        ref_dir, "ref_result_2048.png")), np.float64)
    our_png = np.asarray(Image.open(os.path.join(
        ours_dir, "result_2048.png")), np.float64)
    out["result_rmse_255"] = float(np.sqrt(np.mean(
        (ref_png[..., :3] - our_png[..., :3]) ** 2)))
    out["result_frac_within_1"] = float(np.mean(
        np.abs(ref_png[..., :3] - our_png[..., :3]) <= 1.0))

    # The two subdivision implementations enumerate the midpoint vertices in
    # different orders, so align the dumps GEOMETRICALLY (the positions are
    # the same f64 midpoints) before comparing the advected signals.
    from scipy.spatial import cKDTree

    match = None
    per_level = {}
    for lvl in range(10):
        errs = {}
        for tag in ("S", "T"):
            rp = os.path.join(ref_dir, f"resampled.{tag}.{lvl}.ply")
            op = os.path.join(ours_dir, f"resampled.{tag}.{lvl}.ply")
            if not (os.path.exists(rp) and os.path.exists(op)):
                continue
            r = read_triangle_mesh(rp)
            o = read_triangle_mesh(op)
            if match is None:
                dist, match = cKDTree(o.vertices).query(r.vertices)
                out["vertex_match_max_dist"] = float(dist.max())
            errs[tag] = float(np.sqrt(np.mean(
                (r.colors.astype(np.float64)
                 - o.colors.astype(np.float64)[match]) ** 2)))
        if errs:
            per_level[lvl] = errs
    out["resampled_rmse_255"] = per_level
    print(json.dumps(out, indent=1))
    return out


def check(ref_dir="/tmp/parity2k", ours_dir="/tmp/parity2k/ours"):
    """Assert the PARITY_2K.json thresholds on fresh artifacts (the former
    perpetually-skipped test_golden test; CI texture parity now lives in
    the committed 256^2 fixture, test_golden_texture_cube_256)."""
    out = compare(ref_dir, ours_dir)
    assert out["result_rmse_255"] < 1.0
    assert out["result_frac_within_1"] > 0.995
    assert out["vertex_match_max_dist"] < 1e-6
    for lvl, errs in out["resampled_rmse_255"].items():
        for tag, rmse in errs.items():
            assert rmse < 0.1, (lvl, tag, rmse)
    print("parity2k check: PASS")


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "compare"
    if phase == "ours":
        run_ours(*sys.argv[2:3])
    elif phase == "check":
        check(*sys.argv[2:4])
    else:
        compare(*sys.argv[2:4])
