"""Sequence-tracking CLI — halfway-align every consecutive frame pair of a
signal sequence over ONE shared mesh.

The reference engine was the alignment core of a photometric tracking
pipeline (README.md:9), where consecutive frames of a signal living on a
fixed mesh are pairwise aligned and the per-pair flows are composed across
the sequence (the ResampleSignalWhitneyComposedFlow machinery,
OpticalFlow.cpp:239-260). The shipped reference app only exposes one pair
per invocation (OpticalFlow.cpp:56-63), so tracking N frames re-runs all
mesh preprocessing N-1 times. This driver makes the sequence the unit of
work: mesh subdivision, FEM operators, the multigrid hierarchy, and the
rasterized texel table are built once (per-mesh disk artifact cache,
utils/artifacts.py) and every pair pays only its own level solves.

Usage:
    python -m meshopticalflow_tpu.apps.track_sequence \
        --in f0.png f1.png f2.png ... --mesh mesh.ply --outDir out/
    python -m meshopticalflow_tpu.apps.track_sequence \
        --in f0.ply f1.ply f2.ply ... --outDir out/ [--composed]

Outputs in --outDir, for each pair i = (frame i, frame i+1):
    halfway_%03d.png|.ply  — the blended halfway signal (what --out writes)
    vectorField_%03d.bin   — per-triangle flow 2-vectors in the reference's
                             WriteVector layout (Src/VectorIO.h:8-31, the
                             format OpticalFlow.cpp:641-651 reads back)
    metrics.jsonl          — one JSON line per pair (timings, alignment error)
    composed_resampled.ply — (--composed, per-vertex Whitney runs) frame 0's
                             colors advected through the WHOLE composed flow
                             chain, last-to-first (OpticalFlow.cpp:251)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    from meshopticalflow_tpu.apps.optical_flow import add_alignment_flags

    p = argparse.ArgumentParser(
        prog="TrackSequence",
        description="Pairwise halfway alignment of a frame sequence on a mesh (TPU)")
    p.add_argument("--in", dest="inputs", nargs="+", metavar="FRAME",
                   required=True,
                   help="frame sequence: .png textures (with --mesh) or colored .ply meshes")
    p.add_argument("--mesh", help="shared geometry (.ply); switches to texture mode")
    p.add_argument("--outDir", required=True, help="output directory")
    p.add_argument("--composed", action="store_true",
                   help="also resample frame 0 through the composed flow chain "
                        "(per-vertex Whitney runs)")
    add_alignment_flags(p)
    return p


def main(argv=None) -> int:
    from meshopticalflow_tpu.utils.compat import honor_platform_env
    honor_platform_env()
    args = build_parser().parse_args(argv)
    if len(args.inputs) < 2:
        print("need at least two frames", file=sys.stderr)
        return 1

    import numpy as np

    from meshopticalflow_tpu.apps.optical_flow import config_from_args
    from meshopticalflow_tpu.flow.pipeline import FlowProblem
    from meshopticalflow_tpu.io.binio import write_vector

    config = config_from_args(args)
    texture_mode = bool(args.mesh)
    os.makedirs(args.outDir, exist_ok=True)
    metrics_path = os.path.join(args.outDir, "metrics.jsonl")

    coeff_chain = []
    tm = None
    first_problem = None
    with open(metrics_path, "w") as mf:
        for i in range(len(args.inputs) - 1):
            pair = (args.inputs[i], args.inputs[i + 1])
            t0 = time.time()
            if texture_mode:
                problem = FlowProblem.from_texture_inputs(args.mesh, pair, config)
                ext = ".png"
            else:
                problem = FlowProblem.from_vertex_inputs(pair[0], pair[1], config)
                ext = ".ply"
            init_s = time.time() - t0
            if args.verbose:
                print(f"[pair {i}] {pair[0]} -> {pair[1]}: "
                      f"{problem.mesh.n_vertices} verts / "
                      f"{problem.mesh.n_triangles} tris (init {init_s:.1f} s)")
            t0 = time.time()
            result = problem.run(verbose=args.verbose)
            run_s = time.time() - t0
            problem.write_output(os.path.join(args.outDir, f"halfway_{i:03d}{ext}"))
            # Per-triangle flow 2-vectors, readable by the reference's
            # ReadVector debug hook (OpticalFlow.cpp:641-651).
            write_vector(os.path.join(args.outDir, f"vectorField_{i:03d}.bin"),
                         np.asarray(result.tfield, np.float64))
            mf.write(json.dumps({
                "pair": i, "frames": list(pair),
                "init_seconds": round(init_s, 2),
                "level_seconds": round(run_s, 2),
                "alignment_error": float(result.metrics[-1]["alignment_error"]),
            }) + "\n")
            mf.flush()
            if args.composed and not texture_mode and args.vfMode == 0:
                coeff_chain.append(np.asarray(problem.coeffs, np.float64))
                tm = problem.arrays.tm
                if first_problem is None:
                    first_problem = problem

    if coeff_chain and first_problem is not None:
        import jax.numpy as jnp

        from meshopticalflow_tpu.io.ply import write_ply_colored
        from meshopticalflow_tpu.kernels.advect import (
            resample_signal_composed_whitney)
        from meshopticalflow_tpu.models.whitney import edge_reduction

        # Signed half-edge expansion of each pair's Whitney DoFs
        # (Whitney.inl:28-62), stacked into the (F, 3T) field chain the
        # composed resampler scans last-to-first (OpticalFlow.cpp:251).
        red, sign, _ = edge_reduction(first_problem.mesh.opp)
        fields = jnp.asarray(np.stack([c[red] * sign for c in coeff_chain]),
                             first_problem.dtype)
        colors = jnp.asarray(first_problem.vertex_colors[0], first_problem.dtype)
        out = resample_signal_composed_whitney(
            tm, fields, colors, 0.5, min_step=config.flow_min_step,
            max_steps=config.flow_max_steps)
        write_ply_colored(
            os.path.join(args.outDir, "composed_resampled.ply"),
            np.asarray(first_problem.vertices),
            np.clip(np.asarray(out, np.float64), 0, 255),
            first_problem.mesh.triangles)
    return 0


if __name__ == "__main__":
    sys.exit(main())
