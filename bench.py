"""Benchmark: end-to-end halfway alignment of a 2K uv-atlas pair on one chip.

Prints ONE COMPACT JSON line:
    {"metric": "texels_per_sec_per_chip_2k_atlas", "value": N,
     "unit": "texels/s", "vs_baseline": R, "detail": {...small...}}

The detail block is deliberately SMALL (atlas/levels/protocol/draw rates/
alignment error/memory) so the driver's output-tail capture can always
parse the line — round 3's record was lost because the line inlined full
per-draw profiles and overflowed the capture (VERDICT r3 weak #1).  The
complete per-draw records (stage timings, bandwidth, init profile) are
written to bench_runs/driver_*.json instead; the compact line carries the
artifact filename.

The workload is the reference demo geometry (Example/mesh.ply, subdivided to
~216k triangles) with its texture pair upsampled to 2048x2048 — the
BASELINE.md north-star configuration.

Throttle-robust protocol (VERDICT r2 next #2): the tunneled axon device's
throughput varies 3-6x across time windows and its first device-to-host
fetch per process can wedge for minutes, so ONE draw is a lottery ticket.
This bench runs BENCH_DRAWS (default 5) full end-to-end draws — each one
constructs the problem from its inputs and runs init + levels + advection —
inside one process, reports the MEDIAN end-to-end rate as the headline
value, and persists every draw in the detail block.  Five draws (not
three) because a throttled window routinely burns one or two draws on
multi-tens-of-seconds mid-run stalls (e.g. the 2026-08-19T1322 artifact:
26.8k/42.2k/95.0k in one run) — a 5-draw median stays on the warm cluster
with up to two bad draws; the marginal cost is ~2 warm draws (~90 s). Compilation and
per-mesh artifact caches are shared across draws, exactly as they are for
a user aligning many pairs on one machine (the reference binary similarly
pays its OS page cache once).
"""

import json
import os
import statistics
import sys
import threading
import time

import numpy as np

# ---------------------------------------------------------------------------
# Stall watchdog.  When the tunneled device is fully down, jax backend init
# (make_c_api_client) blocks FOREVER with no exception to catch — a bare
# bench would hang instead of reporting.  A daemon thread watches a progress
# heartbeat; if nothing moves for BENCH_STALL_S it prints the honest result
# line (median of completed draws, or a failure record) and exits the
# process.  The threshold sits above the documented 0-25 min first-fetch
# wedge so a slow-but-alive draw is never cut short.
# ---------------------------------------------------------------------------
_progress = {"t": time.time(), "done": False, "results": [], "stage": "start"}


def _heartbeat(stage):
    _progress["t"] = time.time()
    _progress["stage"] = stage


def _last_measured():
    """Summary of the newest archived full-protocol bench artifact
    (bench_runs/) — attached to failure records so a tunnel outage at bench
    time doesn't erase the existence of a real measurement from the same
    round. Ordered by the timestamp embedded in the FILENAME (mtimes are all
    equal after a fresh clone) and skipping sub-protocol records (<5 draws —
    experiment captures must not stand in for the official number)."""
    import glob
    import re
    here = os.path.dirname(os.path.abspath(__file__))

    def _stamp(p):
        m = re.search(r"(\d{4}-\d{2}-\d{2}T?\d*)", os.path.basename(p))
        return (m.group(1) if m else "", os.path.getmtime(p))

    best = None
    for p in sorted(glob.glob(os.path.join(here, "bench_runs", "*.json")),
                    key=_stamp, reverse=True):
        try:
            with open(p) as f:
                d = json.load(f)
        except Exception:
            continue
        draws = d.get("draw_e2e_texels_per_sec") or []
        rec = {"artifact": os.path.basename(p), "value": d.get("value"),
               "unit": d.get("unit"), "vs_baseline": d.get("vs_baseline")}
        if d.get("value") is not None and len(draws) >= 5:
            return rec
        if best is None and d.get("value") is not None:
            best = rec   # fallback: newest parseable record of any protocol
    return best


# Reference binary end-to-end seconds measured on this machine's host CPU
# (single core, g++ -O3 -ffast-math; BASELINE.md): 181 s at 2048^2,
# 258 s at 4096^2 (the Cholesky levels are resolution-independent, so the
# per-texel rate rises with atlas size). Unmeasured sizes fall back to the
# 2K per-texel rate.
_REFERENCE_SECONDS = {2048: 181.0, 4096: 258.0}

# Multi-threaded reference bound (VERDICT r4 next #3). This host has ONE
# physical core (nproc=1), so the reference's default
# --threads=omp_get_max_threads() IS 1 here and a real MT wall time cannot
# be measured. What CAN be measured is the Amdahl floor: the reference's 2K
# run is 88% serial Eigen-3.2 SimplicialLLT numeric factorization +
# back-substitution (206.4 s of a 234.1 s single-occupant e2e run,
# bench_runs/ref2k_stages_r5.log — Eigen's sparse Cholesky is
# single-threaded at any --threads), so an infinitely-parallel build of
# the same binary could not beat that serial part. The floor below scales
# that measured serial fraction onto the official 181 s baseline e2e
# (the r5 capture window ran ~29% slower than the window the official
# number was taken in): 0.882 * 181 = 159.6 s. vs_baseline_mt_est in the
# bench detail divides against it. The unmeasurable remainder is MKL
# Pardiso (multithreaded supernodal factorization — the README's
# EIGEN_USE_MKL_ALL hook); see BASELINE.md. 4K floor computed the same
# way (bench_runs/ref4k_stages_r5.log: 224.2 s serial of 265.4 s e2e,
# 84.5% of the official 258 s).
_REFERENCE_MT_FLOOR_SECONDS: dict = {2048: 159.6, 4096: 218.0}


def _mt_est(size, value):
    floor_s = _REFERENCE_MT_FLOOR_SECONDS.get(size)
    if not floor_s:
        return None
    return round(value / (size * size / floor_s), 4)


def _reference_rate(size):
    ref_s = _REFERENCE_SECONDS.get(size)
    if ref_s is not None:
        return size * size / ref_s
    return 2048 * 2048 / 181.0


def _metric_name():
    size = int(os.environ.get("BENCH_ATLAS", "2048"))
    return f"texels_per_sec_per_chip_{size // 1024}k_atlas"


def _device_memory_stats():
    """Compact device-memory snapshot (the honest analog of the reference's
    MemoryUsage.h:35-199 process-RSS introspection; VERDICT r3 next #8).
    Returns {} when the backend doesn't expose memory_stats (CPU)."""
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats() or {}
        out = {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                out[k.replace("bytes", "mb")] = round(stats[k] / 2**20, 1)
        return out
    except Exception:
        return {}


def _archive_full_record(record):
    """Write the complete per-draw record to bench_runs/ and return the
    artifact filename (the compact driver line references it).
    BENCH_ARCHIVE_DIR redirects the archive — the protocol tests set it to
    a tmp dir so stub records never masquerade as measurements in
    bench_runs/ (that HAS happened; memory/repo-state-round3.md)."""
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.environ.get("BENCH_ARCHIVE_DIR") \
        or os.path.join(here, "bench_runs")
    os.makedirs(outdir, exist_ok=True)
    stamp = time.strftime("%Y-%m-%dT%H%M%S")
    name = f"driver_{record['metric']}_{stamp}.json"
    try:
        with open(os.path.join(outdir, name), "w") as f:
            json.dump(record, f, indent=1)
        return name
    except Exception:
        return None


def _emit(results, note):
    rates = sorted(d["e2e_texels_per_sec"] for d in results)
    size = int(os.environ.get("BENCH_ATLAS", "2048"))
    reference_texels_per_sec = _reference_rate(size)
    if rates:
        value = statistics.median(rates)
        detail = {
            "protocol": f"median of {len(results)} completed draws; {note}",
            "draw_e2e_texels_per_sec": rates,
        }
        full = {"metric": _metric_name(), "value": round(value, 1),
                "note": note, "draws": results}
        artifact = _archive_full_record(full)
        if artifact:
            detail["full_record"] = artifact
    else:
        value = 0.0
        detail = {"error": note}
        last = _last_measured()
        if last:
            detail["last_measured"] = last
    print(json.dumps({
        "metric": _metric_name(), "value": round(value, 1), "unit": "texels/s",
        "vs_baseline": round(value / reference_texels_per_sec, 4),
        "detail": detail}), flush=True)


def _watchdog(stall_s):
    while True:
        time.sleep(15)
        if _progress["done"]:
            return
        idle = time.time() - _progress["t"]
        if idle > stall_s:
            note = (f"backend stalled {int(idle)} s at stage "
                    f"'{_progress['stage']}' (tunnel down?)")
            print(f"[bench] watchdog: {note}", file=sys.stderr, flush=True)
            if not _progress["done"]:
                _emit(_progress["results"], note)
            os._exit(0)


def one_draw(paths, size, levels, draw=0):
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.flow.pipeline import FlowProblem

    cfg = FlowConfig(levels=levels,
                     flow_backend=os.environ.get("BENCH_FLOW_BACKEND", "auto"))
    # Stage-level heartbeats so the stall watchdog distinguishes a
    # throttled-but-alive draw (init alone has measured 469-1100 s under
    # throttle) from a dead backend within one draw.
    _heartbeat(f"draw {draw}: init")
    t0 = time.time()
    prob = FlowProblem.from_texture_inputs("/root/reference/Example/mesh.ply",
                                           tuple(paths), cfg)
    init_s = time.time() - t0
    _heartbeat(f"draw {draw}: levels")
    t0 = time.time()
    res = prob.run(verbose=False)
    run_s = time.time() - t0
    _heartbeat(f"draw {draw}: output")
    t0 = time.time()
    # The product output stage: advect both textures, blend on device,
    # download the uint8 halfway image once (what --out writes).
    prob.halfway_texture()
    out_s = time.time() - t0

    texels = size * size
    total_s = init_s + run_s + out_s
    return {
        "init_s": round(init_s, 2),
        "levels_s": round(run_s, 2),
        "advect_s": round(out_s, 2),
        "total_s": round(total_s, 2),
        "e2e_texels_per_sec": round(texels / total_s, 1),
        "pipeline_texels_per_sec": round(texels / (run_s + out_s), 1),
        "final_alignment_error": round(float(res.metrics[-1]["alignment_error"]), 4),
        "level_seconds": [round(m["seconds"], 2) for m in res.metrics],
        "level_stage_seconds": [
            [round(m.get(k, 0.0), 2) for k in
             ("smooth_seconds", "trace_seconds", "solve_seconds")]
            for m in res.metrics],
        "flow_eff_gbps": [round(m["flow_eff_gbps"], 1) for m in res.metrics
                          if "flow_eff_gbps" in m],
        "init_profile": getattr(prob, "init_profile", {}),
        "triangles": prob.mesh.n_triangles,
    }


def main():
    size = int(os.environ.get("BENCH_ATLAS", "2048"))
    levels = int(os.environ.get("BENCH_LEVELS", "10"))
    draws = int(os.environ.get("BENCH_DRAWS", "5"))
    stall_s = float(os.environ.get("BENCH_STALL_S", "2100"))
    threading.Thread(target=_watchdog, args=(stall_s,), daemon=True).start()

    from PIL import Image

    # Upsample the reference demo texture pair to the target atlas size.
    tmpdir = "/tmp/meshflow_bench"
    os.makedirs(tmpdir, exist_ok=True)
    paths = []
    for name in ("A", "B"):
        src = f"/root/reference/Example/{name}.png"
        dst = os.path.join(tmpdir, f"{name}_{size}.png")
        if not os.path.exists(dst):
            img = Image.open(src).convert("RGB").resize((size, size), Image.LANCZOS)
            img.save(dst)
        paths.append(dst)

    # Tunnel quiescence: the axon terminal wedges a fresh process's first
    # device fetch for 1-25 minutes while it tears down the PREVIOUS
    # process's device state. The cooldown waits out that teardown BEFORE
    # measurement starts — environment hygiene, not pipeline work.
    cooldown = float(os.environ.get("BENCH_COOLDOWN_S", "60"))
    time.sleep(cooldown)
    _heartbeat("backend_init")

    results = _progress["results"]
    error = None
    for i in range(draws):
        _heartbeat(f"draw {i + 1}")
        try:
            results.append(one_draw(paths, size, levels, draw=i + 1))
        except Exception as exc:   # e.g. the tunneled backend going away
            error = f"draw {i + 1}: {type(exc).__name__}: {exc}"
            print(f"[bench] {error}", file=sys.stderr, flush=True)
            break
        print(f"[bench] draw {i + 1}/{draws}: "
              f"{json.dumps(results[-1], default=float)}", file=sys.stderr,
              flush=True)
        if i == 0:
            # Backend is live: record the platform-version sidecar for the
            # relaunch-miss forensics (utils/jitcache.py).
            from meshopticalflow_tpu.utils.jitcache import \
                record_platform_sidecar_if_ready
            record_platform_sidecar_if_ready()
    _progress["done"] = True

    if not results:
        # Emit an honest failure record rather than no JSON line at all.
        _emit([], error or "no draws completed")
        return

    rates = sorted(d["e2e_texels_per_sec"] for d in results)
    value = statistics.median(rates)
    reference_texels_per_sec = _reference_rate(size)
    protocol = (f"median of {len(results)}/{draws} end-to-end draws, "
                f"one process" + (f"; aborted: {error}" if error else ""))
    # Full per-draw record (stage timings, bandwidth, init profiles) goes to
    # bench_runs/; the printed line stays compact so the driver can parse it.
    full = {
        "metric": _metric_name(), "value": round(value, 1),
        "unit": "texels/s",
        "vs_baseline": round(value / reference_texels_per_sec, 4),
        "atlas": size, "levels": levels, "protocol": protocol,
        # Configuration provenance (ADVICE r4): an experimental-backend or
        # short-protocol capture must be distinguishable from a regression
        # of the default path.
        "flow_backend": os.environ.get("BENCH_FLOW_BACKEND", "auto"),
        "draws_requested": draws,
        "vs_baseline_mt_est": _mt_est(size, value),
        "draw_e2e_texels_per_sec": rates,
        "draw_pipeline_texels_per_sec": sorted(
            d["pipeline_texels_per_sec"] for d in results),
        "device_memory": _device_memory_stats(),
        "draws": results,
    }
    artifact = _archive_full_record(full)
    result = {
        "metric": _metric_name(),
        "value": round(value, 1),
        "unit": "texels/s",
        "vs_baseline": round(value / reference_texels_per_sec, 4),
        "detail": {
            "atlas": size,
            "levels": levels,
            "protocol": protocol,
            "draw_e2e_texels_per_sec": rates,
            "draw_pipeline_texels_per_sec": full["draw_pipeline_texels_per_sec"],
            "final_alignment_error": results[-1]["final_alignment_error"],
            "triangles": results[-1]["triangles"],
            "device_memory": full["device_memory"],
            "vs_baseline_mt_est": _mt_est(size, value),
            "full_record": artifact,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
