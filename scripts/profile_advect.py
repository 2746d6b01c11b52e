"""Split the output (halfway-texture) stage into march / sample / tail /
fetch on chip — decides whether the bilinear sampler's 4-row gathers are
worth a quad-table rewrite (gathers cost per ROW on this backend).

Usage: BENCH_ATLAS=4096 python scripts/profile_advect.py [reps=3]
Artifact: bench_runs/round4_profile_advect_<date>.jsonl
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "bench_runs",
                   f"round4_profile_advect_{time.strftime('%Y-%m-%d')}.jsonl")


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    size = int(os.environ.get("BENCH_ATLAS", "4096"))

    from PIL import Image
    tmpdir = "/tmp/meshflow_bench"
    os.makedirs(tmpdir, exist_ok=True)
    paths = []
    for name in ("A", "B"):
        src = f"/root/reference/Example/{name}.png"
        dst = os.path.join(tmpdir, f"{name}_{size}.png")
        if not os.path.exists(dst):
            Image.open(src).convert("RGB").resize(
                (size, size), Image.LANCZOS).save(dst)
        paths.append(dst)

    import jax.numpy as jnp

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow import pipeline as pl
    from meshopticalflow_tpu.kernels.advect import (_fetch_colors,
                                                    flow_field_trace_compacted)
    from meshopticalflow_tpu.utils.fetch import fetch as _fetch

    cfg = FlowConfig(levels=10)
    prob = pl.FlowProblem.from_texture_inputs(
        "/root/reference/Example/mesh.ply", tuple(paths), cfg)
    t0 = time.time()
    prob.run(verbose=False)
    emit({"atlas": size, "levels_s": round(time.time() - t0, 1)})

    src = prob.texture_source
    h, w = src.height, src.width
    for rep in range(reps):
        row = {"rep": rep}
        t0 = time.time()
        prob._ensure_advect_order()
        n = prob._advect_src_t.shape[0]
        t2, p2, times = pl._halfway_lanes(prob._advect_src_t,
                                          prob._advect_src_p,
                                          jnp.asarray(-0.5, prob.dtype),
                                          jnp.asarray(0.5, prob.dtype))
        t2.block_until_ready()
        row["lanes_setup_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        t1, p1, exhausted = flow_field_trace_compacted(
            prob.arrays.tm, prob.tfield, times, t2, p2,
            cfg.flow_min_step, cfg.flow_max_steps)
        t1.block_until_ready()
        row["march_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        c0 = _fetch_colors(prob.arrays.tm, prob.tri_uvs, prob.textures[0],
                           t1[:n], p1[:n], True)
        c1 = _fetch_colors(prob.arrays.tm, prob.tri_uvs, prob.textures[1],
                           t1[n:], p1[n:], True)
        c1.block_until_ready()
        c0.block_until_ready()
        row["sample_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        quads = prob._ensure_quad_tables()
        quads[1].block_until_ready()
        row["quad_build_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        c0 = _fetch_colors(prob.arrays.tm, prob.tri_uvs, prob.textures[0],
                           t1[:n], p1[:n], True, quad=quads[0])
        c1 = _fetch_colors(prob.arrays.tm, prob.tri_uvs, prob.textures[1],
                           t1[n:], p1[n:], True, quad=quads[1])
        c1.block_until_ready()
        c0.block_until_ready()
        row["sample_quad_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        q = pl._halfway_tail(c0, c1, prob._advect_order, prob.src_t,
                             prob.textures[0], prob.textures[1], h, w)
        q.block_until_ready()
        row["tail_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        _fetch(q)
        row["fetch_s"] = round(time.time() - t0, 2)
        row["total_s"] = round(sum(v for k, v in row.items()
                                   if k.endswith("_s")), 2)
        emit(row)


if __name__ == "__main__":
    main()
