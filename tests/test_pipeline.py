import numpy as np
import pytest

import jax.numpy as jnp

from meshopticalflow_tpu.config import FlowConfig, VectorFieldMode
from meshopticalflow_tpu.flow.pipeline import FlowProblem, sample_texture_to_vertices
from meshopticalflow_tpu.flow.signal import dog_band, make_smoothing_operators, smooth_signal
from meshopticalflow_tpu.geometry.mesh import build_mesh
from meshopticalflow_tpu.io.ply import write_ply_colored
from tests.conftest import make_sphere_mesh


def _sphere_signal_pair(subdiv=2, angle=0.12):
    """Two signals on a sphere: f and f pulled back by a small z-rotation."""
    tris, verts = make_sphere_mesh(subdiv)

    def f(p):
        return np.stack([
            128 + 100 * np.sin(3 * p[:, 0]) * np.cos(2 * p[:, 1]),
            128 + 100 * np.cos(3 * p[:, 1] + 1) * p[:, 2],
            128 + 100 * np.sin(2 * p[:, 2] + 0.5),
        ], axis=1)

    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return tris, verts, f(verts), f(verts @ rot.T)


def test_smooth_signal_matches_scipy():
    import scipy.sparse.linalg as spla
    from meshopticalflow_tpu.ops.assemble import scalar_mass_csr, scalar_stiffness_csr
    tris, verts = make_sphere_mesh(2)
    mesh = build_mesh(tris, vertices=verts)
    ops = make_smoothing_operators(mesh, jnp.float64)
    rng = np.random.default_rng(0)
    sig = rng.uniform(0, 255, (mesh.n_vertices, 3))
    w = 3e-3
    out, _ = smooth_signal(ops, jnp.asarray(sig), w, tol=1e-12, max_iters=5000)
    m = scalar_mass_csr(mesh)
    k = scalar_stiffness_csr(mesh)
    expect = spla.spsolve((m + w * k).tocsc(), m @ sig)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-8)


def test_dog_band_preserves_mean_and_variance():
    tris, verts = make_sphere_mesh(2)
    mesh = build_mesh(tris, vertices=verts)
    ops = make_smoothing_operators(mesh, jnp.float64)
    rng = np.random.default_rng(1)
    sig = jnp.asarray(rng.uniform(0, 255, (mesh.n_vertices, 3)))
    band = dog_band(ops, sig, 1e-4, tol=1e-12)
    from meshopticalflow_tpu.flow.signal import integral
    from meshopticalflow_tpu.ops.ell import ell_matvec
    # Renormalization restores the original mean and mass-variance
    # (OpticalFlow.cpp:830-853).
    np.testing.assert_allclose(np.asarray(integral(ops, band)),
                               np.asarray(integral(ops, sig)), rtol=1e-6)
    def var(x):
        b = ell_matvec(ops.cols, ops.mass_vals, x)
        a = integral(ops, x)
        return np.asarray(jnp.einsum("vc,vc->c", x, b)) - np.asarray(a) ** 2
    np.testing.assert_allclose(var(band), var(sig), rtol=1e-6)


@pytest.mark.parametrize("mode", [VectorFieldMode.WHITNEY, VectorFieldMode.CONNECTION,
                                  VectorFieldMode.CONFORMAL])
def test_vertex_pipeline_reduces_alignment_error(tmp_path, mode):
    tris, verts, sig0, sig1 = _sphere_signal_pair()
    # Write the colored pair to PLY and run through the public entry point.
    p0, p1 = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    write_ply_colored(p0, verts, sig0, tris)
    write_ply_colored(p1, verts, sig1, tris)
    cfg = FlowConfig(vf_mode=mode, levels=4, dtype="float64",
                     dog_weight=0.0, cg_tol=1e-10, cg_max_iters=4000)
    prob = FlowProblem.from_vertex_inputs(p0, p1, cfg)
    res = prob.run()
    errs = [m["alignment_error"] for m in res.metrics]
    assert errs[-1] < errs[0] * 0.55, errs
    assert np.isfinite(res.tfield).all()
    out = str(tmp_path / "out.ply")
    prob.write_output(out)
    from meshopticalflow_tpu.io.ply import read_triangle_mesh
    m = read_triangle_mesh(out)
    assert m.colors is not None and np.isfinite(m.colors).all()


def test_texture_pipeline_smoke(tmp_path):
    """Tiny synthetic uv atlas: a shifted blob pair aligns toward halfway."""
    from meshopticalflow_tpu.io.ply import write_ply_textured
    from meshopticalflow_tpu.io.png import write_png_rgb
    n = 9
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], 1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, (i + 1) * n + j, (i + 1) * n + j + 1, i * n + j + 1
            tris += [[a, b, c], [a, c, d]]
    tris = np.array(tris, np.int32)
    uvs = verts[tris][:, :, :2]

    size = 48
    uu, vv = np.meshgrid(np.arange(size) / (size - 1), np.arange(size) / (size - 1),
                         indexing="xy")

    def blob(cx, cy):
        img = 255 * np.exp(-(((uu - cx) ** 2 + (vv - cy) ** 2) / 0.02))
        # row 0 of a PNG is top = v=1: flip.
        return np.flipud(np.stack([img] * 3, -1)).astype(np.uint8)

    mesh_path = str(tmp_path / "mesh.ply")
    a_path, b_path = str(tmp_path / "A.png"), str(tmp_path / "B.png")
    write_ply_textured(mesh_path, verts, tris, uvs)
    write_png_rgb(a_path, blob(0.42, 0.5))
    write_png_rgb(b_path, blob(0.58, 0.5))

    cfg = FlowConfig(levels=4, dtype="float64", dog_weight=0.0,
                     subdivide_edge_length=0.0, scalar_smooth_weight=1e-3,
                     vf_smooth_weight=1e-5, cg_tol=1e-9, cg_max_iters=3000)
    prob = FlowProblem.from_texture_inputs(mesh_path, (a_path, b_path), cfg)
    res = prob.run()
    errs = [m["alignment_error"] for m in res.metrics]
    assert errs[-1] < errs[0] * 0.7, errs
    out_path = str(tmp_path / "out.png")
    prob.write_output(out_path)
    from meshopticalflow_tpu.io.png import read_png_rgb
    out = read_png_rgb(out_path).astype(np.float64)
    # The aligned blend's peak should sit near the halfway center (0.5, 0.5),
    # and be brighter than the naive linear blend's double-bump.
    naive = (blob(0.42, 0.5).astype(np.float64) + blob(0.58, 0.5)) / 2
    assert out.max() > naive.max() + 10

    # The device-side blend+quantize (one uint8 fetch — the production
    # output path) must be BIT-IDENTICAL to blending the two advected
    # float textures on host.
    adv = prob.advected_textures()
    host_blend = (adv[0] + adv[1]) / 2.0
    host_q = np.clip(host_blend, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(prob.halfway_texture(), host_q)


def test_flow_warm_start_matches_cold():
    """Warm-starting each level's flow solve from the previous level's
    direction must not change the trajectory: the refinement loop converges
    both runs to the same outer residual (flow_refine_tol), so the final
    fields agree to solver tolerance. Runs the production MG + refinement
    stack (hierarchy=True) in f32 to exercise the device-residual path."""
    import dataclasses
    from meshopticalflow_tpu.utils.testing import synthetic_sphere_problem
    cfg = FlowConfig(levels=3, dtype="float32", dog_weight=0.0)
    res_w = synthetic_sphere_problem(cfg, subdiv=2, hierarchy=True).run()
    cfg_c = dataclasses.replace(cfg, flow_warm_start=False)
    res_c = synthetic_sphere_problem(cfg_c, subdiv=2, hierarchy=True).run()
    errs_w = [m["alignment_error"] for m in res_w.metrics]
    errs_c = [m["alignment_error"] for m in res_c.metrics]
    np.testing.assert_allclose(errs_w, errs_c, rtol=1e-3)
    scale = max(1e-12, float(np.abs(res_c.tfield).max()))
    np.testing.assert_allclose(res_w.tfield, res_c.tfield, atol=2e-3 * scale)


def test_checkpoint_resume(tmp_path):
    """Interrupted runs resume deterministically from the last level."""
    from meshopticalflow_tpu.utils.testing import synthetic_sphere_problem
    cfg = FlowConfig(vf_mode=VectorFieldMode.CONNECTION, levels=3, dtype="float64",
                     dog_weight=0.0, cg_tol=1e-10, cg_max_iters=2000)
    ck = str(tmp_path / "ck")
    p1 = synthetic_sphere_problem(cfg, subdiv=2)
    full = p1.run(checkpoint_dir=None)
    # Run 2 levels with checkpointing, then resume a fresh problem.
    cfg2 = FlowConfig(vf_mode=VectorFieldMode.CONNECTION, levels=2, dtype="float64",
                      dog_weight=0.0, cg_tol=1e-10, cg_max_iters=2000)
    p2 = synthetic_sphere_problem(cfg2, subdiv=2)
    p2.run(checkpoint_dir=ck)
    p3 = synthetic_sphere_problem(cfg, subdiv=2)
    res3 = p3.run(checkpoint_dir=ck, resume=True)
    assert len(res3.metrics) == 1  # only the third level ran
    np.testing.assert_allclose(p3.tfield, full.tfield, atol=1e-8)


def test_multiframe_texture_interpolation(tmp_path):
    """N-frame interpolation: endpoints equal the inputs, midframe moves."""
    from meshopticalflow_tpu.io.ply import write_ply_textured
    from meshopticalflow_tpu.io.png import write_png_rgb
    n = 7
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], 1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, (i + 1) * n + j, (i + 1) * n + j + 1, i * n + j + 1
            tris += [[a, b, c], [a, c, d]]
    tris = np.array(tris, np.int32)
    uvs = verts[tris][:, :, :2]
    size = 32
    rng = np.random.default_rng(0)
    texa = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    texb = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    write_ply_textured(str(tmp_path / "m.ply"), verts, tris, uvs)
    write_png_rgb(str(tmp_path / "A.png"), texa)
    write_png_rgb(str(tmp_path / "B.png"), texb)
    cfg = FlowConfig(levels=1, dtype="float64", dog_weight=0.0,
                     subdivide_edge_length=0.0)
    prob = FlowProblem.from_texture_inputs(str(tmp_path / "m.ply"),
                                           (str(tmp_path / "A.png"), str(tmp_path / "B.png")), cfg)
    prob.run()
    frames = prob.advected_texture_frames(3)
    assert frames.shape == (2, 3, size, size, 3)
    np.testing.assert_allclose(frames[0, 0], np.flipud(texa.astype(np.float64)))
    np.testing.assert_allclose(frames[1, 0], np.flipud(texb.astype(np.float64)))
    assert np.isfinite(frames).all()


def test_flow_rounds_metric_formats_pinned_rounds():
    """The level metric formatter must accept pinned-schedule round records
    (rel is None by design — no per-round residual fetch); a bench run
    crashed on exactly this (round 4)."""
    from meshopticalflow_tpu.flow.pipeline import _format_rounds
    assert _format_rounds([(48, None), (48, 1.6e-4)]) == \
        "48@pinned; 48@1.6e-04"


def test_device_state_reused_across_constructions(tmp_path, monkeypatch):
    """Constructing the SAME texture problem twice in one process serves the
    device state (basis arrays, texel table, textures, signals) from the
    process devcache (utils/devcache.py; VERDICT r4 next #4) — and the
    second problem's trajectory is identical."""
    from meshopticalflow_tpu.io.ply import write_ply_textured
    from meshopticalflow_tpu.io.png import write_png_rgb
    from meshopticalflow_tpu.utils import devcache

    monkeypatch.setenv("MESHFLOW_CACHE", str(tmp_path / "artifacts"))
    devcache.clear()
    n = 7
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                         indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], 1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b = i * n + j, (i + 1) * n + j
            c, d = (i + 1) * n + j + 1, i * n + j + 1
            tris += [[a, b, c], [a, c, d]]
    tris = np.array(tris, np.int32)
    uvs = verts[tris][:, :, :2]
    size = 32
    uu, vv = np.meshgrid(np.arange(size) / (size - 1),
                         np.arange(size) / (size - 1), indexing="xy")
    img = np.flipud(np.stack([255 * np.exp(
        -(((uu - 0.45) ** 2 + (vv - 0.5) ** 2) / 0.02))] * 3, -1)) \
        .astype(np.uint8)
    mesh_path = str(tmp_path / "m.ply")
    a_path, b_path = str(tmp_path / "A.png"), str(tmp_path / "B.png")
    write_ply_textured(mesh_path, verts, tris, uvs)
    write_png_rgb(a_path, img)
    write_png_rgb(b_path, np.roll(img, 3, axis=1))

    # dog_weight > 0: the preprocessed-signals artifact key (and hence its
    # devcache entry) only exists for the DoG path — the production config.
    cfg = FlowConfig(levels=2, dtype="float64", dog_weight=1.0,
                     subdivide_edge_length=0.0, cg_tol=1e-9,
                     cg_max_iters=2000)
    p1 = FlowProblem.from_texture_inputs(mesh_path, (a_path, b_path), cfg)
    r1 = p1.run()
    p2 = FlowProblem.from_texture_inputs(mesh_path, (a_path, b_path), cfg)
    # Identity, not equality: the buffers must be the SAME device arrays.
    assert p2.arrays.basis.ell_cols is p1.arrays.basis.ell_cols
    assert p2.src_t is p1.src_t and p2.src_p is p1.src_p
    assert p2.textures is p1.textures
    assert p2.arrays.signals is p1.arrays.signals
    r2 = p2.run()
    np.testing.assert_array_equal(np.asarray(r1.tfield),
                                  np.asarray(r2.tfield))
    assert [m["alignment_error"] for m in r1.metrics] == \
        [m["alignment_error"] for m in r2.metrics]

    # Disabled cache -> fresh buffers, same numbers.
    monkeypatch.setenv("MESHFLOW_DEVCACHE", "0")
    p3 = FlowProblem.from_texture_inputs(mesh_path, (a_path, b_path), cfg)
    assert p3.src_t is not p1.src_t
    r3 = p3.run()
    np.testing.assert_array_equal(np.asarray(r1.tfield),
                                  np.asarray(r3.tfield))
    devcache.clear()


def test_devcache_byte_budget_evicts_lru(monkeypatch):
    """Eviction is BYTE-bounded (HBM is the budget), keeping at least the
    newest entry (code-review r5 finding #2)."""
    import numpy as np

    from meshopticalflow_tpu.utils import devcache

    devcache.clear()
    monkeypatch.setattr(devcache, "_MAX_BYTES", 3 * 1024)
    a = devcache.get_or_build(("a",), lambda: np.zeros(256, np.float64))
    b = devcache.get_or_build(("b",), lambda: np.zeros(256, np.float64))
    # 2 KiB each against a 3 KiB budget: 'a' must have been evicted.
    assert devcache.total_bytes() == 2048
    assert devcache.get_or_build(("b",), lambda: None) is b
    a2 = devcache.get_or_build(("a",), lambda: np.ones(256, np.float64))
    assert a2 is not a                     # rebuilt, not served stale
    # An entry larger than the whole budget is still cached (never evict
    # down to zero — the value is live and in use).
    big = devcache.get_or_build(("big",), lambda: np.zeros(4096, np.float64))
    assert devcache.get_or_build(("big",), lambda: None) is big
    devcache.clear()


def test_devcache_entry_nbytes_walks_handles():
    import numpy as np

    from meshopticalflow_tpu.utils import devcache

    class Handle:
        def __init__(self):
            self.x = np.zeros(10, np.float32)
            self.y = (np.zeros(5, np.float64), "meta")

    assert devcache._entry_nbytes((Handle(), np.zeros(2, np.int8))) == \
        40 + 40 + 2


def test_pinned_schedule_persists_across_processes(monkeypatch, tmp_path):
    """A schedule pinned by one process is served from disk to the next
    (utils/artifacts JSON sidecar), so the fixed-pipeline executables hit
    the cross-process XLA cache instead of recompiling (round-5 draw-2
    tax). Corrupt/foreign records are rejected."""
    from meshopticalflow_tpu.models import base
    from meshopticalflow_tpu.solvers import pallas_mg
    from meshopticalflow_tpu.solvers import df32
    from meshopticalflow_tpu.utils import artifacts

    monkeypatch.setenv("MESHFLOW_CACHE", str(tmp_path))

    class Pack:
        cache_key = "cafef00d"

    class Solver:
        pack_id = 7

        def solve_fixed(self):
            pass

        c1_dinv = object()

    pack, solver = Pack(), Solver()
    reg = pallas_mg._PACKS.__class__()
    reg[7] = pack
    monkeypatch.setattr(pallas_mg, "_PACKS", reg)
    monkeypatch.setattr(df32, "df32_probe", lambda backend="": True)
    # Shadow the real module-global BEFORE storing: a leaked entry under a
    # live pack uid could be replayed by an unrelated later test.
    monkeypatch.setattr(base, "_FLOW_SCHED", {})

    base._store_schedule(solver, 3e-9, 2, (48, 24))
    # "Process 2": empty in-memory table, same disk.
    monkeypatch.setattr(base, "_FLOW_SCHED", {})
    rhs = jnp.zeros(8, jnp.float32)
    assert base._flow_schedule_for(solver, rhs, None, 3e-9, 2) == (48, 24)
    # Different level / tolerance: no record.
    assert base._flow_schedule_for(solver, rhs, None, 3e-9, 3) is None
    monkeypatch.setattr(base, "_FLOW_SCHED", {})
    assert base._flow_schedule_for(solver, rhs, None, 1e-6, 2) is None
    # Corrupt/foreign records are rejected: wrong types, JSON booleans
    # (ints to isinstance), and off-ladder counts.
    for bad in ([10_000, "x"], [True, 24], [37]):
        artifacts.save_json("sched", base._sched_disk_key(solver, 3e-9, 2),
                            bad)
        monkeypatch.setattr(base, "_FLOW_SCHED", {})
        assert base._flow_schedule_for(solver, rhs, None, 3e-9, 2) is None
    # Tuple sched_keys (the production (level, config-digest) form) make
    # filesystem-safe disk keys.
    assert "(" not in base._sched_disk_key(solver, 3e-9, (3, "a1b2"))
    # Ad-hoc pack (no artifact key): stays process-local.
    pack.cache_key = ""
    base._store_schedule(solver, 3e-9, 5, (96,))
    monkeypatch.setattr(base, "_FLOW_SCHED", {})
    assert base._flow_schedule_for(solver, rhs, None, 3e-9, 5) is None
