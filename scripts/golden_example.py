"""Golden regression: run the reference demo end-to-end and compare against
the reference's own result.png.

    python scripts/golden_example.py [--cpu] [--levels N]

Passes when our halfway blend is closer to the reference result than the
naive 50/50 blend (the reference's output itself was produced by a
different compiler/linear-algebra stack, so exact pixel equality is not the
bar; the f64-oracle RMSE is ~15.16 vs naive 18.0).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--levels", type=int, default=10)
    ap.add_argument("--out", default="/tmp/golden_result.png")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem
    from meshopticalflow_tpu.io.png import read_png_rgb

    cfg = FlowConfig(levels=args.levels)
    t0 = time.time()
    prob = FlowProblem.from_texture_inputs(
        "/root/reference/Example/mesh.ply",
        ("/root/reference/Example/A.png", "/root/reference/Example/B.png"), cfg)
    prob.run(verbose=True)
    prob.write_output(args.out)
    elapsed = time.time() - t0

    def rmse(x, y):
        return float(np.sqrt(((x - y) ** 2).mean()))

    ref = read_png_rgb("/root/reference/Example/result.png").astype(np.float64)
    ours = read_png_rgb(args.out).astype(np.float64)
    a = read_png_rgb("/root/reference/Example/A.png").astype(np.float64)
    b = read_png_rgb("/root/reference/Example/B.png").astype(np.float64)
    naive = rmse((a + b) / 2, ref)
    score = rmse(ours, ref)
    print(json.dumps({"rmse_vs_reference": round(score, 3),
                      "naive_blend_rmse": round(naive, 3),
                      "seconds": round(elapsed, 1),
                      "pass": score < naive}))
    return 0 if score < naive else 1


if __name__ == "__main__":
    sys.exit(main())
