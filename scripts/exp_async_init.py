"""On-chip A/B: blocking vs async init uploads (MESHFLOW_SYNC_INIT).

The init path used to block_until_ready() on the texture (2x50 MB at 4K)
and texel-table uploads purely for profiling attribution; the tunnel moves
h2d at ~16 MB/s, so at 4K those blocks cost ~13 s of wall before the first
level dispatch.  Async init enqueues the transfers and lets the DMA ride
under the ~31 s of level solves — IF the tunneled runtime overlaps h2d with
compute.  This measures that question end-to-end, ABAB-interleaved in one
process (throttle protocol, memory/axon-tpu-quirks.md).

Usage: BENCH_ATLAS=4096 python scripts/exp_async_init.py [reps=2]
Artifact: bench_runs/round4_exp_async_init_<date>.jsonl
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench

OUT = os.path.join(os.path.dirname(__file__), "..", "bench_runs",
                   f"round4_exp_async_init_{time.strftime('%Y-%m-%d')}.jsonl")


def emit(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    size = int(os.environ.get("BENCH_ATLAS", "4096"))
    levels = int(os.environ.get("BENCH_LEVELS", "10"))

    from PIL import Image
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

    emit({"exp": "async_init", "atlas": size, "levels": levels, "reps": reps})
    draw = 0
    for rep in range(reps):
        for mode in ("sync", "async"):
            os.environ["MESHFLOW_SYNC_INIT"] = "1" if mode == "sync" else "0"
            draw += 1
            t0 = time.time()
            r = bench.one_draw(paths, size, levels, draw=draw)
            emit({"rep": rep, "mode": mode, "init_s": r["init_s"],
                  "levels_s": r["levels_s"], "advect_s": r["advect_s"],
                  "total_s": r["total_s"],
                  "e2e_texels_per_sec": r["e2e_texels_per_sec"],
                  "align": r["final_alignment_error"],
                  "wall_s": round(time.time() - t0, 1),
                  "init_profile": {k: v for k, v in r["init_profile"].items()
                                   if v and v > 0.2}})


if __name__ == "__main__":
    main()
