"""On-chip A/B experiment over one FlowConfig field at bench scale.

Runs interleaved (A, B, A, B, ...) full pipeline draws of the 2K
bench workload in ONE process (the only apples-to-apples protocol on the
throttle-lottery axon tunnel; memory/axon-tpu-quirks.md), reporting per-draw
level solve seconds, refinement round trails, and total flow iterations.

    python scripts/exp_warm.py [--pairs 2] [--size 2048] [--levels 10] \
        [--toggle flow_warm_start | mg_c1_bf16 | ...] \
        [--values mf,auto]   # string-valued fields (e.g. flow_backend)
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, ".")


def one(cfg, paths):
    from meshopticalflow_tpu.flow.pipeline import FlowProblem

    t0 = time.time()
    prob = FlowProblem.from_texture_inputs("/root/reference/Example/mesh.ply",
                                           tuple(paths), cfg)
    init_s = time.time() - t0
    t0 = time.time()
    res = prob.run(verbose=False)
    run_s = time.time() - t0
    solve_s = [round(m["solve_seconds"], 2) for m in res.metrics]
    return {
        "init_s": round(init_s, 1),
        "levels_s": round(run_s, 2),
        "solve_s": solve_s,
        "solve_total_s": round(sum(solve_s), 2),
        "flow_iters": [int(m["flow_iters"]) for m in res.metrics],
        "rounds": [m.get("flow_rounds", "") for m in res.metrics],
        "final_err": round(float(res.metrics[-1]["alignment_error"]), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--levels", type=int, default=10)
    ap.add_argument("--toggle", default="flow_warm_start",
                    help="FlowConfig field to A/B")
    ap.add_argument("--values", default="",
                    help="comma-separated pair of values (default: True,False)")
    args = ap.parse_args()

    from PIL import Image
    tmpdir = "/tmp/meshflow_bench"
    os.makedirs(tmpdir, exist_ok=True)
    paths = []
    for name in ("A", "B"):
        src = f"/root/reference/Example/{name}.png"
        dst = os.path.join(tmpdir, f"{name}_{args.size}.png")
        if not os.path.exists(dst):
            img = Image.open(src).convert("RGB").resize(
                (args.size, args.size), Image.LANCZOS)
            img.save(dst)
        paths.append(dst)

    from meshopticalflow_tpu.config import FlowConfig
    base = FlowConfig(levels=args.levels)
    values = args.values.split(",") if args.values else (True, False)
    for i in range(args.pairs):
        for on in values:
            cfg = dataclasses.replace(base, **{args.toggle: on})
            rec = one(cfg, paths)
            rec.update(draw=i, toggle=args.toggle, on=on)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
