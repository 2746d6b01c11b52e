"""Live terminal viewer: rasterizer correctness, key dispatch, camera
manipulation, export — the interactive-loop analog of the reference's GLUT
shell (include/Misha/Visualization.h:34-141)."""

import io
import os

import numpy as np
import pytest

from meshopticalflow_tpu.viz.live import (
    KeyboardCallBack, LiveViewer, TerminalDisplay, frame_to_ansi,
    render_rgb, _token_keys)
from meshopticalflow_tpu.viz.surface import Camera


def _two_triangles():
    # Two overlapping triangles, one nearer the camera than the other.
    verts = np.array([
        [-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.0, 0.0],   # far
        [-1.0, -1.0, 1.0], [1.0, -1.0, 1.0], [0.0, 1.0, 1.0],   # near
    ])
    tris = np.array([[0, 1, 2], [3, 4, 5]])
    return verts, tris


def test_render_rgb_zbuffer_front_wins():
    verts, tris = _two_triangles()
    # Look straight down +z so the z=1 triangle is nearer.
    cam = Camera(azimuth=0.0, elevation=1.45, distance=3.0,
                 target=(0.0, 0.0, 0.5))
    colors = np.array([[255, 0, 0], [0, 255, 0]], float)
    img = render_rgb(verts, tris, cam, 64, 64, face_colors=colors)
    # Center pixels overlap both triangles; the near (green) one must win.
    center = img[28:36, 28:36].reshape(-1, 3).astype(int)
    on_mesh = center[(center.sum(axis=1) > 60)]
    assert len(on_mesh) > 0
    assert (on_mesh[:, 1] > on_mesh[:, 0]).all()


def test_render_rgb_covers_and_offscreen_safe():
    verts, tris = _two_triangles()
    img = render_rgb(verts, tris, Camera(target=(0, 0, 0.5)), 48, 40)
    assert img.shape == (40, 48, 3)
    # Off-screen camera: must not crash, returns background only.
    far = Camera(target=(1e6, 1e6, 1e6))
    img2 = render_rgb(verts, tris, far, 16, 16)
    assert (img2 == img2[0, 0]).all()


def test_frame_to_ansi_halfblocks():
    img = np.zeros((4, 3, 3), np.uint8)
    img[0, :, 0] = 255
    txt = frame_to_ansi(img, status="hello")
    assert "▀" in txt
    assert "\x1b[38;2;255;0;0m" in txt
    assert "hello" in txt
    # Odd height pads rather than crashing.
    assert "▀" in frame_to_ansi(np.zeros((3, 2, 3), np.uint8))


def test_token_keys_decode():
    keys = list(_token_keys(io.StringIO("l + left\nq\n")))
    assert keys == ["l", "+", "left", "q"]


def _viewer(tmp_path, keys, **kw):
    verts, tris = _two_triangles()
    out = io.StringIO()
    v = LiveViewer(verts, tris, out_dir=str(tmp_path),
                   display=TerminalDisplay(stream=out),
                   key_source=iter(keys), **kw)
    return v, out


def test_live_loop_orbit_zoom_pan_quit(tmp_path):
    v, out = _viewer(tmp_path, ["l", "k", "+", "L", "q"])
    az0, el0, d0, t0 = (v.camera.azimuth, v.camera.elevation,
                        v.camera.distance, v.camera.target)
    frames = v.run()
    assert frames >= 5            # initial + one per non-quit key
    assert v.camera.azimuth > az0
    assert v.camera.elevation > el0
    assert v.camera.distance < d0
    assert v.camera.target != t0
    text = out.getvalue()
    assert "▀" in text and "az " in text
    assert "\x1b[?25h" in text    # cursor restored on close


def test_live_export_and_camera_save(tmp_path):
    v, _ = _viewer(tmp_path, ["o", "c", "q"])
    v.run()
    assert os.path.exists(tmp_path / "live_export_000.png")
    cam = Camera.load(str(tmp_path / "camera.json"))
    assert cam.distance == v.camera.distance


def test_live_help_and_custom_callback(tmp_path):
    hits = []
    v, out = _viewer(tmp_path, ["?", "x", "q"])
    v.add_key("x", "custom action", lambda: hits.append(1))
    v.run()
    assert hits == [1]
    assert "orbit left" in out.getvalue()
    assert "custom action" in out.getvalue()
    assert all(isinstance(cb, KeyboardCallBack) for cb in v.callbacks)


def test_live_color_and_vfield_sources(tmp_path):
    verts, tris = _two_triangles()
    out = io.StringIO()
    polled = {"c": 0}

    def colors():
        polled["c"] += 1
        return np.tile([[0, 0, 255]], (len(verts), 1)).astype(float)

    v = LiveViewer(verts, tris, out_dir=str(tmp_path),
                   display=TerminalDisplay(stream=out),
                   key_source=iter(["l", "q"]),
                   color_source=colors,
                   vfield_source=lambda: np.full((len(tris), 2), 0.1))
    v.run()
    assert polled["c"] >= 2       # re-polled every frame
    assert "\x1b[38;2;" in out.getvalue()


def test_unbound_key_is_ignored(tmp_path):
    v, _ = _viewer(tmp_path, ["Z", "q"])
    assert v.run() >= 2


def test_view_spectrum_routes_to_live(tmp_path, monkeypatch):
    """MESHFLOW_LIVE=1 + no DISPLAY runs the terminal live loop with the
    eigenfield paging keys ('b'/'n', Spectrum.cpp:128-145)."""
    from meshopticalflow_tpu.viz import view_spectrum
    from tests.conftest import make_sphere_mesh

    tris, verts = make_sphere_mesh(2)
    fields = np.random.default_rng(2).normal(size=(3, len(tris), 2)) * 0.1
    monkeypatch.setenv("MESHFLOW_LIVE", "1")
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.setattr("sys.stdin", io.StringIO("n n b o q\n"))
    k = view_spectrum(verts, tris, fields, np.array([0.1, 0.2, 0.3]),
                      out_dir=str(tmp_path))
    assert k == 3
    assert os.path.exists(tmp_path / "live_export_000.png")


def test_view_spectrum_live_off_stays_headless(tmp_path, monkeypatch):
    from meshopticalflow_tpu.viz import view_spectrum
    from tests.conftest import make_sphere_mesh

    tris, verts = make_sphere_mesh(2)
    fields = np.zeros((2, len(tris), 2))
    monkeypatch.setenv("MESHFLOW_LIVE", "0")
    monkeypatch.delenv("DISPLAY", raising=False)
    view_spectrum(verts, tris, fields, out_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "eigenfield_001.png")


def test_prompt_token_stream(tmp_path):
    got = []
    v, out = _viewer(tmp_path, ["p", "3.5", "q"])
    v.add_key("p", "prompt demo",
              lambda: got.append(v.prompt("value: ")))
    v.run()
    assert got == ["3.5"]
    assert "value: " in out.getvalue()


def test_view_flow_live_weight_prompt_and_advance(tmp_path, monkeypatch):
    """The live flow viewer: 'w' typed-weight edit (the reference's
    VectorFieldSmoothWeightCallBack, OpticalFlow.cpp:671-677), 'a' advance,
    'q' quit — driven through the real view_flow entry."""
    from meshopticalflow_tpu.config import FlowConfig
    from meshopticalflow_tpu.utils.testing import synthetic_sphere_problem
    from meshopticalflow_tpu.viz import view_flow

    cfg = FlowConfig(dog_weight=0.0, levels=2, dtype="float64",
                     cg_max_iters=100)
    prob = synthetic_sphere_problem(cfg, subdiv=2)
    monkeypatch.setenv("MESHFLOW_LIVE", "1")
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.setattr("sys.stdin", io.StringIO("w 0.125 a t v o q\n"))
    n = view_flow(prob, out_dir=str(tmp_path), interactive=False)
    assert n == 1
    assert os.path.exists(tmp_path / "live_export_000.png")


def test_render_rgb_zoom_scales_coverage():
    """'+'/'-' must change the picture: render_rgb's fit normalization
    would cancel any uniform camera-side scaling, so zoom rides the fit
    scale itself (code-review r5 finding #1)."""
    verts, tris = _two_triangles()
    cam = Camera(target=(0, 0, 0.5))
    bg = np.array([12, 12, 16])

    def coverage(zoom):
        img = render_rgb(verts, tris, cam, 64, 64, zoom=zoom)
        return int((img != bg).any(axis=2).sum())

    c_half, c_one, c_two = coverage(0.5), coverage(1.0), coverage(2.0)
    assert c_half < c_one < c_two


def test_live_zoom_key_changes_pixels(tmp_path):
    frames = []

    class Grab(TerminalDisplay):
        def show(self, img, status=""):
            frames.append(img.copy())
            super().show(img, status)

    verts, tris = _two_triangles()
    v = LiveViewer(verts, tris, out_dir=str(tmp_path),
                   display=Grab(stream=io.StringIO()),
                   key_source=iter(["+", "q"]))
    v.run()
    assert len(frames) >= 2
    assert not np.array_equal(frames[0], frames[1])


def test_escape_quits(tmp_path):
    """GLUT exits on ESC (Visualization.h KeyboardFunc key 27)."""
    v, _ = _viewer(tmp_path, ["escape", "o", "q"])
    v.run()
    assert v.exports == 0          # loop ended before 'o'
