"""Offline surface visualization — the viewer substitute for the reference's
GLUT renderer (Src/SurfaceVisualization.inl, include/Misha/Visualization.h).

The reference's L6 layer is an interactive OpenGL shell: textured /
vertex-colored mesh display, per-triangle vector-field glyphs, an orbit
camera with save/load, and offscreen render-to-PNG
(SurfaceVisualization.inl:39-266). The TPU rebuild is headless-first, so
this module provides the same CAPABILITIES without a GL dependency:

  * :func:`render_surface` — z-sorted painter rasterization of a colored /
    signal-carrying mesh with flat shading and optional vector-field glyphs,
    writing a PNG (the analog of the 'o' offscreen dump,
    SurfaceVisualization.inl:165-266);
  * :class:`Camera` — orbit camera with the reference's save/load contract
    (SurfaceVisualization.inl:103-130 writes eye/target/up; here JSON);
  * :func:`view_flow` — the interactive analog of WhitneyFlowViewer
    (OpticalFlow.cpp:998-1033): steps one alignment level per keypress
    ('a'), toggles the displayed signal ('t'/'n'), exports ('o') — rendered
    frames via matplotlib when a display backend exists, else PNG frames
    per level.

Rendering runs on host numpy/matplotlib (visualization is not a TPU
workload); everything the viewer shows comes from the same FlowProblem
arrays the compute path uses.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np


@dataclasses.dataclass
class Camera:
    """Orbit camera (Misha/Camera.h analog) with JSON save/load
    (SurfaceVisualization.inl:103-130)."""

    azimuth: float = 0.35
    elevation: float = 0.25
    distance: float = 3.0
    target: tuple = (0.0, 0.0, 0.0)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f)

    @classmethod
    def load(cls, path: str) -> "Camera":
        with open(path) as f:
            d = json.load(f)
        d["target"] = tuple(d.get("target", (0, 0, 0)))
        return cls(**d)

    def axes(self):
        """(right, up, forward) unit vectors of the view frame."""
        ca, sa = np.cos(self.azimuth), np.sin(self.azimuth)
        ce, se = np.cos(self.elevation), np.sin(self.elevation)
        forward = -np.array([ca * ce, sa * ce, se])
        right = np.array([-sa, ca, 0.0])
        up = np.cross(right, forward)
        return right, up / np.linalg.norm(up), forward

    def project(self, pts: np.ndarray):
        """Orthographic view-space projection: (N, 3) -> (xy (N, 2), depth)."""
        right, up, forward = self.axes()
        rel = pts - np.asarray(self.target)[None, :]
        return np.stack([rel @ right, rel @ up], axis=1), rel @ forward


def _triangle_shading(verts: np.ndarray, tris: np.ndarray, light) -> np.ndarray:
    e1 = verts[tris[:, 1]] - verts[tris[:, 0]]
    e2 = verts[tris[:, 2]] - verts[tris[:, 0]]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    lam = np.abs(n @ (light / np.linalg.norm(light)))
    return 0.35 + 0.65 * lam


def render_surface(
    verts: np.ndarray,                 # (V, 3)
    tris: np.ndarray,                  # (T, 3)
    out_path: str,
    vertex_colors: Optional[np.ndarray] = None,   # (V, 3) 0..255
    texture: Optional[np.ndarray] = None,         # (H, W, 3) with tri_uvs
    tri_uvs: Optional[np.ndarray] = None,         # (T, 3, 2)
    vfield: Optional[np.ndarray] = None,          # (T, 2) chart 2-vectors
    camera: Optional[Camera] = None,
    size: int = 900,
    glyph_scale: float = 1.0,
    max_glyphs: int = 4000,
) -> None:
    """Painter-sorted flat-shaded render to PNG.

    Signal source precedence mirrors the reference viewer: per-wedge
    texture colors when (texture, tri_uvs) are given (the texture-mapped
    display), else vertex colors averaged per face, else a neutral gray.
    ``vfield`` draws per-triangle glyphs at the barycenters, embedded via
    the chart edge frame — SurfaceVisualization's vector-field mode.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import LineCollection, PolyCollection

    verts = np.asarray(verts, np.float64)
    tris = np.asarray(tris, np.int64)
    if camera is None:
        camera = Camera(target=tuple(verts.mean(axis=0)))
    xy, depth = camera.project(verts)
    face_depth = depth[tris].mean(axis=1)
    order = np.argsort(face_depth)               # back to front

    if texture is not None and tri_uvs is not None:
        h, w = texture.shape[:2]
        uv = np.asarray(tri_uvs, np.float64).mean(axis=1)       # (T, 2)
        x = np.clip(uv[:, 0], 0, 1) * (w - 1)
        y = np.clip(1.0 - uv[:, 1], 0, 1) * (h - 1)
        face_col = np.asarray(texture, np.float64)[
            y.astype(np.int64), x.astype(np.int64)] / 255.0
    elif vertex_colors is not None:
        face_col = np.asarray(vertex_colors, np.float64)[tris].mean(axis=1) / 255.0
    else:
        face_col = np.full((len(tris), 3), 0.7)
    shade = _triangle_shading(verts, tris, np.array([0.4, 0.25, 1.0]))
    face_col = np.clip(face_col * shade[:, None], 0.0, 1.0)

    fig, ax = plt.subplots(figsize=(size / 100, size / 100), dpi=100)
    polys = xy[tris[order]]                      # (T, 3, 2)
    ax.add_collection(PolyCollection(polys, facecolors=face_col[order],
                                     edgecolors="none"))
    if vfield is not None:
        vfield = np.asarray(vfield, np.float64)
        t_sel = np.arange(len(tris))
        if len(t_sel) > max_glyphs:
            t_sel = t_sel[:: len(t_sel) // max_glyphs]
        # Embed chart vectors: v_embedded = e1 * v0 + e2 * v1 (the chart
        # basis is (p1-p0, p2-p0), FEM.inl:1305-1323).
        e1 = verts[tris[t_sel, 1]] - verts[tris[t_sel, 0]]
        e2 = verts[tris[t_sel, 2]] - verts[tris[t_sel, 0]]
        vec = e1 * vfield[t_sel, 0:1] + e2 * vfield[t_sel, 1:2]
        base = verts[tris[t_sel]].mean(axis=1)
        tip = base + glyph_scale * vec
        b_xy, _ = camera.project(base)
        t_xy, _ = camera.project(tip)
        segs = np.stack([b_xy, t_xy], axis=1)
        ax.add_collection(LineCollection(segs, colors="black", linewidths=0.6))
    lim = np.abs(xy).max() * 1.05 + 1e-12
    ax.set_xlim(-lim, lim)
    ax.set_ylim(-lim, lim)
    ax.set_aspect("equal")
    ax.axis("off")
    fig.tight_layout(pad=0)
    fig.savefig(out_path)
    plt.close(fig)


def _want_terminal_live() -> bool:
    """True when the process is attached to an interactive terminal (or
    MESHFLOW_LIVE=1 forces it) — the display-less live-viewer trigger.
    MESHFLOW_LIVE=0 forces headless frame dumps even on a tty."""
    import os
    import sys

    env = os.environ.get("MESHFLOW_LIVE", "").strip().lower()
    if env in ("0", "off", "no"):
        return False
    if env in ("1", "on", "yes"):
        return True
    try:
        return sys.stdin.isatty() and sys.stdout.isatty()
    except Exception:
        return False


def _interactive_pager(out_dir: str, export, title, handle_key) -> None:
    """Shared matplotlib pager scaffold for the interactive viewers:
    temp-PNG redraw, key dispatch, window lifecycle. ``export(path)``
    renders the current state to a PNG; ``title()`` builds the window
    title; ``handle_key(key) -> bool`` mutates viewer state, returning
    False to close the window."""
    import os

    import matplotlib
    matplotlib.use(matplotlib.get_backend())
    import matplotlib.pyplot as plt

    fig = plt.figure()

    def redraw():
        tmp = os.path.join(out_dir, "_viewer_frame.png")
        export(tmp)
        import matplotlib.image as mpimg
        fig.clf()
        ax = fig.add_subplot(111)
        ax.imshow(mpimg.imread(tmp))
        ax.axis("off")
        ax.set_title(title())
        fig.canvas.draw_idle()

    def on_key(event):
        if not handle_key(event.key):
            plt.close(fig)
            return
        redraw()

    fig.canvas.mpl_connect("key_press_event", on_key)
    redraw()
    plt.show()


def view_flow(problem, out_dir: str = ".", interactive: Optional[bool] = None,
              camera: Optional[Camera] = None, glyph_scale: float = 1.0):
    """Level-stepping viewer over a FlowProblem — the WhitneyFlowViewer
    analog (OpticalFlow.cpp:998-1033).

    Interactive (matplotlib window): 'a' advances one level, 't' toggles
    which signal is shown, 'v' toggles vector-field glyphs, 'o' exports the
    current frame + camera, 'q' quits. Headless (no display): runs all
    levels and writes ``level_%03d.png`` frames to ``out_dir``.
    """
    import os

    import matplotlib

    if interactive is None:
        interactive = bool(os.environ.get("DISPLAY"))

    state = {"level": 0, "signal": 0, "glyphs": True}
    cam = camera or Camera(target=tuple(np.asarray(problem.vertices).mean(axis=0))
                           if problem.vertices is not None else (0, 0, 0))
    cfg = problem.config
    s_weight = cfg.scalar_smooth_weight
    v_weight = cfg.resolved_vf_smooth_weight()

    def current_colors():
        sig = np.asarray(problem.arrays.signals)
        c = sig.shape[1] // 2
        half = sig[:, :c] if state["signal"] == 0 else sig[:, c:]
        cols = half[:, :3] if c == 3 else half[:, :3] + half[:, 3:6]
        return np.clip(cols, 0, 255)

    def advance():
        from meshopticalflow_tpu.flow.pipeline import _level_step

        import jax.numpy as jnp

        coeffs, tfield, stats, _ = _level_step(
            problem.arrays, problem.coeffs, problem.tfield,
            jnp.asarray(state.get("s_weight", s_weight), problem.dtype),
            jnp.asarray(state.get("v_weight", v_weight), problem.dtype),
            cfg, problem.coarse, getattr(problem, "vcoarse", None),
            getattr(problem, "patch", None), getattr(problem, "vpatch", None))
        problem.coeffs, problem.tfield = coeffs, tfield
        state["s_weight"] = state.get("s_weight", s_weight) * cfg.scalar_weight_multiplier
        vw = state.get("v_weight", v_weight) * cfg.vf_weight_multiplier
        if vw > cfg.vf_smooth_weight_threshold:
            state["v_weight"] = vw
        state["level"] += 1
        return stats

    def export(path):
        render_surface(np.asarray(problem.vertices), problem.mesh.triangles,
                       path, vertex_colors=current_colors(),
                       vfield=np.asarray(problem.tfield) if state["glyphs"] else None,
                       camera=cam, glyph_scale=glyph_scale)

    os.makedirs(out_dir, exist_ok=True)
    if not interactive and _want_terminal_live():
        # Headless but attached to a terminal: run the LIVE in-terminal
        # viewer (viz/live.py) with the same key bindings on top of the
        # full orbit/pan/zoom camera loop.
        from .live import LiveViewer

        # Frame sources are re-polled every keypress, but the underlying
        # arrays live on DEVICE and only change when a level advances or
        # the signal toggles — cache the d2h fetch by that state so
        # camera-only keys (orbit/pan/zoom) never pay a tunnel fetch.
        frame_cache = {}

        def live_colors():
            key = ("c", state["level"], state["signal"])
            if frame_cache.get("ck") != key:
                frame_cache["ck"], frame_cache["c"] = key, current_colors()
            return frame_cache["c"]

        def live_vfield():
            if not state["glyphs"]:
                return None
            if frame_cache.get("vk") != state["level"]:
                frame_cache["vk"] = state["level"]
                frame_cache["v"] = np.asarray(problem.tfield)
            return frame_cache["v"]

        viewer = LiveViewer(
            np.asarray(problem.vertices), problem.mesh.triangles,
            camera=cam, out_dir=out_dir,
            color_source=live_colors,
            vfield_source=live_vfield,
            status_source=lambda: (f"level {state['level']}"
                                   f" signal {state['signal']}"))
        viewer.add_key("a", "advance one alignment level", advance)
        viewer.add_key("t", "toggle displayed signal",
                       lambda: state.update(signal=1 - state["signal"]))
        viewer.add_key("v", "toggle vector glyphs",
                       lambda: state.update(glyphs=not state["glyphs"]))

        def set_weight(slot, label):
            # The reference viewer's typed weight edits
            # (ScalarSmoothWeightCallBack / VectorFieldSmoothWeightCallBack,
            # OpticalFlow.cpp:662-677): set the smoothing weight the next
            # advanced level will use.
            def f():
                val = viewer.prompt(f"{label} smooth weight: ")
                try:
                    state[slot] = float(val)
                except ValueError:
                    pass
            return f

        viewer.add_key("s", "set scalar smooth weight (prompt)",
                       set_weight("s_weight", "scalar"))
        viewer.add_key("w", "set vector-field smooth weight (prompt)",
                       set_weight("v_weight", "vector-field"))
        viewer.run()
        return state["level"]
    if not interactive:
        export(os.path.join(out_dir, "level_000.png"))
        for lvl in range(cfg.levels):
            advance()
            export(os.path.join(out_dir, f"level_{lvl + 1:03d}.png"))
        cam.save(os.path.join(out_dir, "camera.json"))
        return state["level"]

    def handle_key(key):
        if key == "a":
            advance()
        elif key in ("t", "n"):
            state["signal"] = 1 - state["signal"]
        elif key == "v":
            state["glyphs"] = not state["glyphs"]
        elif key == "o":
            export(os.path.join(out_dir, f"export_{state['level']:03d}.png"))
            cam.save(os.path.join(out_dir, "camera.json"))
        elif key == "q":
            return False
        return True

    _interactive_pager(
        out_dir, export,
        lambda: (f"level {state['level']} — signal {state['signal']}"
                 " [a]dvance [t]oggle [v]ectors [o]utput [q]uit"),
        handle_key)
    return state["level"]


def view_spectrum(verts: np.ndarray, tris: np.ndarray,
                  triangle_fields: np.ndarray,        # (K, T, 2)
                  eigenvalues: Optional[np.ndarray] = None,
                  out_dir: str = ".", interactive: Optional[bool] = None,
                  camera: Optional[Camera] = None, glyph_scale: float = 1.0):
    """Eigen-vector-field pager — the SpectrumViewer analog
    (Spectrum.cpp:128-145, 226-227).

    Interactive (matplotlib window): 'b'/'n' page through the eigenfields
    (the reference's keys), 'o' exports the current frame + camera, 'q'
    quits. Headless (no display): writes ``eigenfield_%03d.png`` for every
    field to ``out_dir``. Returns the number of fields rendered.
    """
    import os

    import matplotlib

    if interactive is None:
        interactive = bool(os.environ.get("DISPLAY"))
    fields = np.asarray(triangle_fields)
    k = fields.shape[0]
    cam = camera or Camera(target=tuple(np.asarray(verts).mean(axis=0)))
    state = {"idx": 0}

    def export(path, idx):
        render_surface(np.asarray(verts), np.asarray(tris), path,
                       vfield=fields[idx], camera=cam,
                       glyph_scale=glyph_scale)

    os.makedirs(out_dir, exist_ok=True)
    if not interactive and _want_terminal_live():
        from .live import LiveViewer

        def title_live():
            ev = ""
            if eigenvalues is not None:
                ev = f" lambda={float(np.asarray(eigenvalues)[state['idx']]):.4g}"
            return f"eigenfield {state['idx'] + 1}/{k}{ev}"

        viewer = LiveViewer(
            np.asarray(verts), np.asarray(tris), camera=cam,
            out_dir=out_dir,
            vfield_source=lambda: fields[state["idx"]],
            status_source=title_live)
        viewer.add_key("n", "next eigenfield",
                       lambda: state.update(idx=(state["idx"] + 1) % k))
        viewer.add_key("b", "previous eigenfield",
                       lambda: state.update(idx=(state["idx"] - 1) % k))
        viewer.run()
        return k
    if not interactive:
        for i in range(k):
            export(os.path.join(out_dir, f"eigenfield_{i + 1:03d}.png"), i)
        cam.save(os.path.join(out_dir, "camera.json"))
        return k

    def title():
        ev = ""
        if eigenvalues is not None:
            ev = f"  lambda={float(np.asarray(eigenvalues)[state['idx']]):.4g}"
        return (f"eigenfield {state['idx'] + 1}/{k}{ev}"
                "  [b]ack [n]ext [o]utput [q]uit")

    def handle_key(key):
        if key == "n":
            state["idx"] = (state["idx"] + 1) % k
        elif key == "b":
            state["idx"] = (state["idx"] - 1) % k
        elif key == "o":
            export(os.path.join(out_dir,
                                f"eigenfield_{state['idx'] + 1:03d}.png"),
                   state["idx"])
            cam.save(os.path.join(out_dir, "camera.json"))
        elif key == "q":
            return False
        return True

    _interactive_pager(out_dir, lambda p: export(p, state["idx"]), title,
                       handle_key)
    return k
