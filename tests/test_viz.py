"""Offline viewer substitute (viz/surface.py) — the L6 analog of
Src/SurfaceVisualization.inl."""

import os

import numpy as np

from meshopticalflow_tpu.viz import Camera, render_surface, view_flow


def test_render_surface_colored_and_glyphs(tmp_path):
    from tests.conftest import make_sphere_mesh
    tris, verts = make_sphere_mesh(2)
    rng = np.random.default_rng(0)
    colors = rng.uniform(0, 255, (len(verts), 3))
    vfield = rng.normal(size=(len(tris), 2)) * 0.1
    out = str(tmp_path / "render.png")
    render_surface(verts, tris, out, vertex_colors=colors, vfield=vfield)
    from PIL import Image
    img = np.asarray(Image.open(out))
    assert img.shape[0] > 100 and img.shape[2] >= 3
    # the mesh must actually be drawn (non-constant image)
    assert img[..., :3].std() > 1.0


def test_render_surface_textured(tmp_path):
    from tests.conftest import make_grid_mesh
    tris, verts = make_grid_mesh(5)
    rng = np.random.default_rng(1)
    tex = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    uvs = verts[tris][:, :, :2]  # grid xy as uv
    out = str(tmp_path / "textured.png")
    render_surface(verts, tris, out, texture=tex, tri_uvs=uvs)
    assert os.path.exists(out)


def test_camera_save_load_roundtrip(tmp_path):
    cam = Camera(azimuth=1.0, elevation=-0.2, distance=2.5, target=(1, 2, 3))
    p = str(tmp_path / "camera.json")
    cam.save(p)
    cam2 = Camera.load(p)
    assert cam2 == cam


def test_view_flow_headless_writes_frames(tmp_path):
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.utils.testing import synthetic_sphere_problem

    cfg = FlowConfig(dog_weight=0.0, levels=2, dtype="float64",
                     cg_max_iters=100)
    prob = synthetic_sphere_problem(cfg, subdiv=2)
    n = view_flow(prob, out_dir=str(tmp_path), interactive=False)
    assert n == 2
    for lvl in range(3):
        assert (tmp_path / f"level_{lvl:03d}.png").exists()
    assert (tmp_path / "camera.json").exists()


def test_view_spectrum_headless_writes_frames(tmp_path):
    from meshopticalflow_tpu.viz import view_spectrum
    from tests.conftest import make_sphere_mesh

    tris, verts = make_sphere_mesh(2)
    rng = np.random.default_rng(2)
    fields = rng.normal(size=(3, len(tris), 2)) * 0.1
    n = view_spectrum(verts, tris, fields, np.array([0.1, 0.5, 1.2]),
                      out_dir=str(tmp_path), interactive=False)
    assert n == 3
    for i in range(3):
        assert (tmp_path / f"eigenfield_{i + 1:03d}.png").exists()
    assert (tmp_path / "camera.json").exists()
