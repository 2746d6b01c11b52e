"""bench.py protocol: median of completed draws, honest failure records."""

import importlib.util
import json
import os

import pytest


@pytest.fixture
def bench_mod(tmp_path, monkeypatch):
    # Stub draws must archive to a tmp dir, never bench_runs/ — synthetic
    # driver_*.json records there read as real measurements.
    monkeypatch.setenv("BENCH_ARCHIVE_DIR", str(tmp_path))
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _draw_stub(rate):
    return {"init_s": 1.0, "levels_s": 1.0, "advect_s": 1.0, "total_s": 3.0,
            "e2e_texels_per_sec": rate, "pipeline_texels_per_sec": 2 * rate,
            "final_alignment_error": 0.0, "level_seconds": [],
            "level_stage_seconds": [], "flow_eff_gbps": [],
            "init_profile": {}, "triangles": 1}


def test_bench_partial_protocol_on_backend_loss(bench_mod, monkeypatch, capsys):
    """A draw failure (e.g. the tunnel going away) reports the median of the
    COMPLETED draws with the abort reason, not a crash with no JSON."""
    monkeypatch.setenv("BENCH_COOLDOWN_S", "0")
    monkeypatch.setenv("BENCH_DRAWS", "3")
    state = {"n": 0}

    def fake_draw(paths, size, levels, draw=0):
        state["n"] += 1
        if state["n"] > 2:
            raise RuntimeError("backend gone")
        return _draw_stub(100.0 * state["n"])

    monkeypatch.setattr(bench_mod, "one_draw", fake_draw)
    bench_mod.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert d["value"] == 150.0           # median of the two completed draws
    assert "aborted: draw 3" in d["detail"]["protocol"]
    assert "2/3" in d["detail"]["protocol"]


def test_bench_watchdog_emits_partial_on_stall(bench_mod, monkeypatch, capsys):
    """If the backend hangs (no exception to catch), the watchdog prints the
    median of completed draws and exits instead of hanging forever."""
    bench_mod._progress["results"].append(_draw_stub(100.0))
    bench_mod._progress["t"] = 0.0          # last heartbeat: epoch
    bench_mod._progress["stage"] = "draw 2"

    def fake_exit(code):
        raise SystemExit(code)

    monkeypatch.setattr(bench_mod.os, "_exit", fake_exit)
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        bench_mod._watchdog(stall_s=1.0)
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] == 100.0
    assert "stalled" in d["detail"]["protocol"]


def test_bench_watchdog_failure_record_when_no_draws(bench_mod, monkeypatch, capsys):
    bench_mod._progress["t"] = 0.0
    bench_mod._progress["stage"] = "backend_init"
    monkeypatch.setattr(bench_mod.os, "_exit",
                        lambda code: (_ for _ in ()).throw(SystemExit(code)))
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit):
        bench_mod._watchdog(stall_s=1.0)
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] == 0.0
    assert "backend_init" in d["detail"]["error"]


def test_bench_size_aware_baseline(bench_mod, monkeypatch, capsys):
    """BENCH_ATLAS=4096 compares against the measured 4K reference rate
    (258 s single-core) and labels the metric accordingly; unmeasured sizes
    fall back to the 2K per-texel rate."""
    monkeypatch.setenv("BENCH_COOLDOWN_S", "0")
    monkeypatch.setenv("BENCH_DRAWS", "1")
    monkeypatch.setenv("BENCH_ATLAS", "4096")
    rate_4k = 4096 * 4096 / 258.0
    monkeypatch.setattr(bench_mod, "one_draw",
                        lambda paths, size, levels, draw=0: _draw_stub(rate_4k))
    # Avoid the PIL upsample of a real 4K texture pair in a unit test.
    monkeypatch.setattr(bench_mod.os.path, "exists", lambda p: True)
    bench_mod.main()
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["metric"] == "texels_per_sec_per_chip_4k_atlas"
    assert d["vs_baseline"] == pytest.approx(1.0, abs=1e-3)
    assert bench_mod._reference_rate(1024) == pytest.approx(2048 * 2048 / 181.0)


def test_bench_zero_draws_failure_record(bench_mod, monkeypatch, capsys):
    monkeypatch.setenv("BENCH_COOLDOWN_S", "0")
    monkeypatch.setenv("BENCH_DRAWS", "2")

    def fake_draw(paths, size, levels, draw=0):
        raise RuntimeError("backend never came up")

    monkeypatch.setattr(bench_mod, "one_draw", fake_draw)
    bench_mod.main()
    d = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["value"] == 0.0
    assert "backend never came up" in d["detail"]["error"]
