"""Probe: does the axon TPU execute the float64 flow pipeline? (VERDICT r4
next #7 scoping). The package is dtype-generic — `--dtype float64` already
runs the CPU f64 oracle path end-to-end — so the device-precision option
reduces to whether XLA:TPU-via-axon accepts f64 programs at all, and at
what cost. Probes, in order:

  1. raw f64 arithmetic (add/mul/dot) + cholesky on device
  2. the per-vertex sphere pipeline at dtype=float64 on device,
     trajectory-compared to the CPU f64 run of the same problem
  3. the 64^2 sharp-cube texture fixture at dtype=float64 on device,
     output-compared (u8 levels) to the CPU f64 output — the documented
     f32 failure boundary (PROGRESS.md round-3 item 3)

Usage: python scripts/exp_f64_tpu.py [stage: raw|sphere|cube|all]
Writes JSON lines; archive to bench_runs/round5_exp_f64_*.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def probe_raw():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_enable_x64", True)
    rec = {"probe": "raw", "backend": jax.default_backend()}
    try:
        t0 = time.time()
        n = 1 << 20
        a = jnp.linspace(0, 1, n, dtype=jnp.float64)
        s = float(jnp.vdot(a, a))
        # Exact value: sum i^2/(n-1)^2 = n(2n-1)/(6(n-1)) — NOT n/3; the
        # original n/3 comparison had a built-in 4.8e-7 relative deviation,
        # so its 1e-12 tolerance could never pass (round-5 probe bug; the
        # 2026-08-20 "dot_ok: false" record is that bug, not an f64 failure).
        exact = n * (2 * n - 1) / (6 * (n - 1))
        rec["dot_rel_err"] = abs(s - exact) / exact
        rec["dot_ok"] = rec["dot_rel_err"] < 1e-12
        rec["dot_s"] = round(time.time() - t0, 3)
    except Exception as exc:  # noqa: BLE001
        rec["dot_error"] = repr(exc)[:300]
    try:
        import numpy as np
        rng = np.random.default_rng(0)
        m = rng.normal(size=(256, 256))
        spd = jnp.asarray(m @ m.T + 256 * np.eye(256), jnp.float64)
        t0 = time.time()
        l = jax.jit(jnp.linalg.cholesky)(spd)
        err = float(jnp.max(jnp.abs(l @ l.T - spd)))
        rec["chol_ok"] = err < 1e-9 * 256
        rec["chol_err"] = err
        rec["chol_s"] = round(time.time() - t0, 3)
    except Exception as exc:  # noqa: BLE001
        rec["chol_error"] = repr(exc)[:300]
    # Relative f64:f32 matmul throughput (how punitive is emulation?)
    try:
        import numpy as np
        x32 = jnp.asarray(np.ones((2048, 2048), np.float32))
        x64 = x32.astype(jnp.float64)
        mm = jax.jit(lambda x: x @ x)
        mm(x32).block_until_ready()
        t0 = time.time()
        for _ in range(3):
            r = mm(x32)
        r.block_until_ready()
        t32 = (time.time() - t0) / 3
        mm(x64).block_until_ready()
        t0 = time.time()
        for _ in range(3):
            r = mm(x64)
        r.block_until_ready()
        t64 = (time.time() - t0) / 3
        rec["mm_f32_s"] = round(t32, 4)
        rec["mm_f64_s"] = round(t64, 4)
        rec["f64_slowdown"] = round(t64 / max(t32, 1e-9), 1)
    except Exception as exc:  # noqa: BLE001
        rec["mm_error"] = repr(exc)[:300]
    return rec


def _sphere_problem(dtype):
    import tempfile

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem
    from meshopticalflow_tpu.io.ply import write_ply_colored
    from meshopticalflow_tpu.utils.testing import sphere_signal_pair
    tris, verts, ca, cb = sphere_signal_pair(4, angle=0.12)
    d = tempfile.mkdtemp()
    write_ply_colored(d + "/A.ply", verts, ca, tris)
    write_ply_colored(d + "/B.ply", verts, cb, tris)
    cfg = FlowConfig(levels=10, dtype=dtype)
    return FlowProblem.from_vertex_inputs(d + "/A.ply", d + "/B.ply", cfg)


def probe_sphere():
    import numpy as np
    rec = {"probe": "sphere_f64_device"}
    prob = _sphere_problem("float64")
    t0 = time.time()
    res = prob.run(verbose=False)
    rec["levels_s"] = round(time.time() - t0, 2)
    rec["alignment"] = float(res.metrics[-1]["alignment_error"])
    rec["tfield_sum"] = float(np.abs(np.asarray(res.tfield)).sum())
    return rec


def probe_cube():
    """64^2 sharp-cube texture fixture at f64 on the device; emits the
    advected-output bytes' agreement with the committed CPU-f64 golden."""
    import numpy as np

    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem
    from meshopticalflow_tpu.io.png import read_png_rgb
    rec = {"probe": "cube_f64_device"}
    cfg = FlowConfig(levels=10, dtype="float64")
    prob = FlowProblem.from_texture_inputs(
        os.path.join(GOLD, "cube.ply"),
        (os.path.join(GOLD, "cA.png"), os.path.join(GOLD, "cB.png")), cfg)
    t0 = time.time()
    prob.run(verbose=False)
    rec["levels_s"] = round(time.time() - t0, 2)
    out = np.asarray(prob.halfway_texture(), np.int32)
    ref = read_png_rgb(os.path.join(GOLD, "ref_cube.png")).astype(np.int32)
    diff = np.abs(out - ref)
    rec["max_u8_diff"] = int(diff.max())
    rec["frac_within_1"] = float((diff <= 1).mean())
    rec["rmse_255"] = float(np.sqrt((diff.astype(np.float64) ** 2).mean()))
    return rec


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    from meshopticalflow_tpu.utils import jitcache
    jitcache.enable_persistent_cache()
    if stage in ("raw", "all"):
        print(json.dumps(probe_raw()), flush=True)
    if stage in ("sphere", "all"):
        print(json.dumps(probe_sphere()), flush=True)
    if stage in ("cube", "all"):
        print(json.dumps(probe_cube()), flush=True)


if __name__ == "__main__":
    main()
