"""Same-window A/B of the flow solve backend: MG-PCG vs multifrontal (mf).

Round-5 decision experiment (VERDICT r4 next #1c/d): the two backends are
run INTERLEAVED in one process on the same inputs so tunnel throttle noise
hits both. Per draw we report the reliable numbers — level totals (each is
measured around a host fetch in flow/pipeline.py run()) — plus the stage
attribution hints and the final alignment error (trajectory parity story:
both land within the measured f32 solution floor, see
bench_runs/round5_exp_mf_resid_2026-08-20.jsonl).

Usage:  python scripts/exp_ab_backend.py [size=2048] [rounds=2]
Output: JSON lines to stdout; archive to bench_runs/round5_exp_ab_*.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def one_draw(paths, size, backend):
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem

    cfg = FlowConfig(levels=10, flow_backend=backend)
    t0 = time.time()
    prob = FlowProblem.from_texture_inputs(
        "/root/reference/Example/mesh.ply", tuple(paths), cfg)
    init_s = time.time() - t0
    t0 = time.time()
    res = prob.run(verbose=False)
    levels_s = time.time() - t0
    t0 = time.time()
    prob.halfway_texture()
    advect_s = time.time() - t0
    return {
        "backend": backend,
        "init_s": round(init_s, 2),
        "levels_s": round(levels_s, 2),
        "advect_s": round(advect_s, 2),
        "level_seconds": [round(m["seconds"], 2) for m in res.metrics],
        "level_stage_seconds": [
            [round(m.get(k, 0.0), 2) for k in
             ("smooth_seconds", "trace_seconds", "solve_seconds")]
            for m in res.metrics],
        "final_alignment_error": round(
            float(res.metrics[-1]["alignment_error"]), 4),
    }


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    paths = [f"/tmp/meshflow_bench/A_{size}.png",
             f"/tmp/meshflow_bench/B_{size}.png"]
    from meshopticalflow_tpu.utils import jitcache
    jitcache.enable_persistent_cache()
    print(json.dumps({"exp": "ab_backend", "size": size, "rounds": rounds}),
          flush=True)
    # "pallas" = the Pallas MG-PCG path (the round-4 shipped default);
    # "mf" = the multifrontal direct solve.
    order = []
    for _ in range(rounds):
        order += ["pallas", "mf"]
    for i, backend in enumerate(order):
        rec = one_draw(paths, size, backend)
        rec["draw"] = i + 1
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
