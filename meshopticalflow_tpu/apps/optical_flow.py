"""OpticalFlow CLI — flag-for-flag rebuild of the reference app
(OpticalFlow/OpticalFlow.cpp:56-109).

Usage:
    python -m meshopticalflow_tpu.apps.optical_flow \
        --mesh mesh.ply --in A.png B.png --out result.png [options]

Headless (``--out``) mode only; the reference's GLUT viewer is out of scope
for the TPU core (SURVEY.md section 2.2).
"""

from __future__ import annotations

import argparse
import json
import sys

from meshopticalflow_tpu.config import ConnectionMode, FlowConfig, VectorFieldMode


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="OpticalFlow",
        description="Halfway optical-flow alignment of signals on a mesh surface (TPU)")
    p.add_argument("--in", dest="inputs", nargs=2, metavar=("A", "B"), required=True,
                   help="input textures (.ply pair or .png pair)")
    p.add_argument("--mesh", help="input geometry (.ply); switches to texture mode")
    p.add_argument("--out", help="output file (.ply or .png)")
    add_alignment_flags(p)
    return p


def add_alignment_flags(p: argparse.ArgumentParser) -> None:
    """The alignment/solver flag surface shared by the pairwise CLI and the
    sequence-tracking CLI (OpticalFlow.cpp:56-109 defaults)."""
    p.add_argument("--vfMode", type=int, default=0,
                   help="vector field mode: 0 Whitney, 1 Conformal, 2 Connection")
    p.add_argument("--cMode", type=int, default=0,
                   help="connection mode: 0 projected barycentric, 1 barycentric dual, 2 inverse cotangent")
    p.add_argument("--iterations", type=int, default=10, help="alignment iterations")
    p.add_argument("--threads", type=int, default=0,
                   help="accepted for reference compatibility; parallelism is device-wide on TPU")
    p.add_argument("--pad", type=int, default=2, help="texture padding radius")
    p.add_argument("--sSmooth", type=float, default=3e-3, help="scalar smoothing weight")
    p.add_argument("--vfSmooth", type=float, default=None,
                   help="vector field smoothing weight (default per mode: 3e-6 / 5e-7 / 1e4)")
    p.add_argument("--vfSThreshold", type=float, default=1e-8,
                   help="vector field weight threshold")
    p.add_argument("--eLength", type=float, default=0.006,
                   help="subdivide edges up to this bbox-diagonal fraction")
    p.add_argument("--dogWeight", type=float, default=1.0,
                   help="difference-of-Gaussians blending weight")
    p.add_argument("--dogSmooth", type=float, default=1e-4,
                   help="difference-of-Gaussians smoothing weight")
    p.add_argument("--sMultiply", type=float, default=0.25,
                   help="scalar weight multiplication factor")
    p.add_argument("--vMultiply", type=float, default=1.0,
                   help="vector field weight multiplication factor")
    p.add_argument("--search", type=float, default=1.0,
                   help="golden-section search range (vestigial in the reference; accepted, unused)")
    p.add_argument("--divFree", action="store_true", help="divergence-free (rotated-gradient) basis")
    p.add_argument("--log", action="store_true", help="log-space signal comparison")
    p.add_argument("--nearest", action="store_true", help="nearest-neighbor texture sampling")
    p.add_argument("--error", action="store_true", help="report alignment error")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--debug", action="store_true", help="dump per-level resampled signals")
    p.add_argument("--dtype", default="float32", help="device dtype (float32/float64)")
    p.add_argument("--hostSolve", action="store_true",
                   help="use the host scipy Cholesky oracle for the level solves")


def config_from_args(args) -> FlowConfig:
    # DoG weight clamped to [0, 1] (OpticalFlow.cpp:1113).
    dog = min(1.0, max(0.0, args.dogWeight))
    return FlowConfig(
        vf_mode=VectorFieldMode(args.vfMode),
        connection_mode=ConnectionMode(args.cMode),
        levels=args.iterations,
        pad_radius=args.pad,
        scalar_smooth_weight=args.sSmooth,
        vf_smooth_weight=args.vfSmooth,
        vf_smooth_weight_threshold=args.vfSThreshold,
        subdivide_edge_length=args.eLength,
        dog_weight=dog,
        dog_smooth=args.dogSmooth,
        scalar_weight_multiplier=args.sMultiply,
        vf_weight_multiplier=args.vMultiply,
        divergence_free=args.divFree,
        log_space=args.log,
        nearest=args.nearest,
        dtype=args.dtype,
        use_host_cholesky=args.hostSolve,
    )


def main(argv=None) -> int:
    from meshopticalflow_tpu.utils.compat import honor_platform_env
    honor_platform_env()
    args = build_parser().parse_args(argv)
    config = config_from_args(args)

    # Multi-process runs: no-op unless a coordinator is configured
    # (MESHFLOW_COORDINATOR / JAX_COORDINATOR_ADDRESS, parallel/distributed.py);
    # then the pipeline shards over the GLOBAL device mesh.
    from meshopticalflow_tpu.parallel.distributed import (global_device_mesh,
                                                          maybe_init_distributed)

    device_mesh = global_device_mesh() if maybe_init_distributed() else None

    from meshopticalflow_tpu.flow.pipeline import FlowProblem

    if args.mesh:
        problem = FlowProblem.from_texture_inputs(args.mesh, tuple(args.inputs),
                                                  config, device_mesh=device_mesh)
    else:
        problem = FlowProblem.from_vertex_inputs(args.inputs[0], args.inputs[1],
                                                 config, device_mesh=device_mesh)
    if args.verbose:
        print(f"Vertices / Triangles: {problem.mesh.n_vertices} / {problem.mesh.n_triangles}")
    if not args.out:
        # Reference behavior: no --out launches the viewer
        # (OpticalFlow.cpp:1072-1092). The TPU rebuild's substitute
        # (viz/surface.py) steps levels interactively under a display and
        # writes per-level frames headlessly.
        from meshopticalflow_tpu.viz import view_flow
        view_flow(problem, out_dir=".")
        return 0
    result = problem.run(verbose=args.verbose,
                         debug_dir="." if args.debug else None)
    problem.write_output(args.out)
    if args.error:
        print(json.dumps({"alignment_error": result.metrics[-1]["alignment_error"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
