"""End-to-end CLI smoke tests (subprocess, CPU-forced)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from meshopticalflow_tpu.io.ply import read_triangle_mesh, write_ply_colored
from meshopticalflow_tpu.utils.testing import sphere_signal_pair

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(snippet: str, timeout=600):
    code = ("import sys; sys.path.insert(0, %r)\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n" % REPO) + snippet
    return subprocess.run([sys.executable, "-c", code],
                          env=dict(os.environ, JAX_PLATFORMS="cpu"),
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def vertex_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    tris, verts, s0, s1 = sphere_signal_pair(2)
    write_ply_colored(str(tmp / "a.ply"), verts, s0, tris)
    write_ply_colored(str(tmp / "b.ply"), verts, s1, tris)
    return tmp


def test_optical_flow_vertex_cli(vertex_pair):
    tmp = vertex_pair
    r = _run(f"""
from meshopticalflow_tpu.apps.optical_flow import main
sys.exit(main(["--in", "{tmp}/a.ply", "{tmp}/b.ply", "--out", "{tmp}/out.ply",
               "--iterations", "2", "--dogWeight", "0", "--dtype", "float64"]))
""")
    assert r.returncode == 0, r.stderr[-2000:]
    m = read_triangle_mesh(str(tmp / "out.ply"))
    assert m.colors is not None and np.isfinite(m.colors).all()


def test_optical_flow_texture_cli(tmp_path):
    """Texture-atlas mode — the reference's primary entry point
    (README.md:27-37): --mesh + PNG pair -> result.png through the
    device-blended output path."""
    from meshopticalflow_tpu.io.ply import write_ply_textured
    from meshopticalflow_tpu.io.png import read_png_rgb, write_png_rgb

    n = 5
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                         indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], 1)
    tris = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (i * n + j, (i + 1) * n + j,
                          (i + 1) * n + j + 1, i * n + j + 1)
            tris += [[a, b, c], [a, c, d]]
    tris = np.array(tris, np.int32)
    write_ply_textured(str(tmp_path / "m.ply"), verts, tris,
                       verts[tris][:, :, :2])
    size = 24
    uu, vv = np.meshgrid(np.arange(size) / (size - 1),
                         np.arange(size) / (size - 1), indexing="xy")
    for name, cx in (("A", 0.45), ("B", 0.55)):
        img = 255 * np.exp(-(((uu - cx) ** 2 + (vv - 0.5) ** 2) / 0.03))
        write_png_rgb(str(tmp_path / f"{name}.png"),
                      np.flipud(np.stack([img] * 3, -1)).astype(np.uint8))
    r = _run(f"""
from meshopticalflow_tpu.apps.optical_flow import main
sys.exit(main(["--mesh", "{tmp_path}/m.ply",
               "--in", "{tmp_path}/A.png", "{tmp_path}/B.png",
               "--out", "{tmp_path}/out.png", "--iterations", "3",
               "--dogWeight", "0", "--eLength", "0"]))
""", timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    out = read_png_rgb(str(tmp_path / "out.png"))
    assert out.shape == (size, size, 3) and out.max() > 50


def test_spectrum_cli(vertex_pair):
    tmp = vertex_pair
    r = _run(f"""
from meshopticalflow_tpu.apps.spectrum import main
sys.exit(main(["--mesh", "{tmp}/a.ply", "--eigenVectors", "3",
               "--outPrefix", "{tmp}", "--dtype", "float64", "--verbose"]))
""")
    assert r.returncode == 0, r.stderr[-2000:]
    from meshopticalflow_tpu.io.binio import read_vector
    v = read_vector(str(tmp / "eigenvector-001.bin"), width=2)
    assert np.isfinite(v).all() and len(v) > 0


def test_sample_texture_cli(tmp_path):
    r = _run(f"""
from meshopticalflow_tpu.apps.sample_texture_to_vertices import main
sys.exit(main(["--in", "/root/reference/Example/mesh.ply",
               "--texture", "/root/reference/Example/A.png",
               "--out", "{tmp_path}/baked.ply", "--eLength", "0.02"]))
""")
    assert r.returncode == 0, r.stderr[-2000:]
    m = read_triangle_mesh(str(tmp_path / "baked.ply"))
    assert m.colors is not None and len(m.vertices) == 20000


def test_spectrum_edge_metric_cli(tmp_path):
    """--edgeMetric: metric-only input reproduces the embedding spectrum."""
    import json
    from meshopticalflow_tpu.io.ply import write_ply_metric
    from meshopticalflow_tpu.utils.testing import octa_sphere
    tris, verts = octa_sphere(1)
    p = verts[tris]
    sq = np.stack([((p[:, (j + 1) % 3] - p[:, (j + 2) % 3]) ** 2).sum(1)
                   for j in range(3)], axis=1)
    write_ply_metric(str(tmp_path / "metric.ply"), verts, tris, sq)
    out = {}
    for name, args in (("embed", f'"--mesh", "{tmp_path}/metric.ply"'),
                       ("metric", f'"--mesh", "{tmp_path}/metric.ply", "--edgeMetric"')):
        r = _run(f"""
from meshopticalflow_tpu.apps.spectrum import main
sys.exit(main([{args}, "--eigenVectors", "3", "--outPrefix", "{tmp_path}",
               "--dtype", "float64", "--verbose"]))
""")
        assert r.returncode == 0, r.stderr[-2000:]
        import json as _json
        out[name] = _json.loads(r.stdout.strip().splitlines()[-1])["eigenvalues"]
    np.testing.assert_allclose(out["embed"], out["metric"], rtol=1e-6)


def test_track_sequence_vertex_cli(vertex_pair, tmp_path):
    """Three-frame per-vertex sequence: two pairs aligned over the shared
    mesh, per-pair halfway PLYs + reference-format flow dumps + metrics,
    composed-flow resampling of frame 0; pair 0 matches the single-pair CLI
    byte-for-byte."""
    tmp = vertex_pair
    out = tmp_path / "seq"
    common = '"--iterations", "2", "--dogWeight", "0", "--dtype", "float64"'
    r = _run(f"""
from meshopticalflow_tpu.apps.track_sequence import main
sys.exit(main(["--in", "{tmp}/a.ply", "{tmp}/b.ply", "{tmp}/a.ply",
               "--outDir", "{out}", "--composed", {common}]))
""")
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    from meshopticalflow_tpu.io.binio import read_vector
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert [l["pair"] for l in lines] == [0, 1]
    for i in (0, 1):
        assert (out / f"halfway_{i:03d}.ply").exists()
        vf = read_vector(str(out / f"vectorField_{i:03d}.bin"), width=2)
        assert vf.ndim == 2 and vf.shape[1] == 2 and np.isfinite(vf).all()
    comp = read_triangle_mesh(str(out / "composed_resampled.ply"))
    assert comp.colors is not None and np.isfinite(comp.colors).all()

    # pair 0 == the single-pair CLI on the same inputs/flags
    r2 = _run(f"""
from meshopticalflow_tpu.apps.optical_flow import main
sys.exit(main(["--in", "{tmp}/a.ply", "{tmp}/b.ply",
               "--out", "{tmp_path}/single.ply", {common}]))
""")
    assert r2.returncode == 0, r2.stderr[-2000:]
    a = read_triangle_mesh(str(out / "halfway_000.ply")).colors
    b = read_triangle_mesh(str(tmp_path / "single.ply")).colors
    np.testing.assert_array_equal(a, b)


def test_optical_flow_serve_mode(vertex_pair, tmp_path):
    """--serve persistent worker (VERDICT r3 next #7): two jobs through one
    process's stdin loop; results match the one-shot CLI, the second job
    reuses the warm jit cache, and a malformed job reports an error line
    without killing the loop."""
    import json

    tmp = vertex_pair
    code = ("import sys; sys.path.insert(0, %r)\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from meshopticalflow_tpu.apps.optical_flow import main\n"
            "sys.exit(main(['--serve']))" % REPO)
    # stderr -> DEVNULL: nobody drains it while this test blocks on stdout
    # readlines, and jax/XLA warnings can fill the 64 KB pipe buffer and
    # deadlock the worker mid-job (observed: the suite hung here).
    p = subprocess.Popen([sys.executable, "-c", code],
                         env=dict(os.environ, JAX_PLATFORMS="cpu"),
                         stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True)
    try:
        assert json.loads(p.stdout.readline())["ready"] is True
        jobs = [
            {"in": [f"{tmp}/a.ply", f"{tmp}/b.ply"],
             "out": str(tmp_path / "s1.ply"),
             "iterations": 2, "dogWeight": 0, "dtype": "float64"},
            {"bad": "job"},   # missing in/out -> error line, loop survives
            {"in": [f"{tmp}/a.ply", f"{tmp}/b.ply"],
             "out": str(tmp_path / "s2.ply"),
             "iterations": 2, "dogWeight": 0, "dtype": "float64"},
        ]
        replies = []
        for job in jobs:
            p.stdin.write(json.dumps(job) + "\n")
            p.stdin.flush()
            replies.append(json.loads(p.stdout.readline()))
        p.stdin.write('{"cmd": "quit"}\n')
        p.stdin.flush()
        assert p.wait(timeout=120) == 0
    finally:
        p.kill()
    assert replies[0]["out"].endswith("s1.ply")
    assert "error" in replies[1]
    assert replies[2]["out"].endswith("s2.ply")
    a = read_triangle_mesh(str(tmp_path / "s1.ply")).colors
    b = read_triangle_mesh(str(tmp_path / "s2.ply")).colors
    np.testing.assert_array_equal(a, b)

    # serve results == the one-shot CLI on the same inputs/flags
    r = _run(f"""
from meshopticalflow_tpu.apps.optical_flow import main
sys.exit(main(["--in", "{tmp}/a.ply", "{tmp}/b.ply",
               "--out", "{tmp_path}/one.ply", "--iterations", "2",
               "--dogWeight", "0", "--dtype", "float64"]))
""")
    assert r.returncode == 0, r.stderr[-2000:]
    one = read_triangle_mesh(str(tmp_path / "one.ply")).colors
    np.testing.assert_array_equal(a, one)
