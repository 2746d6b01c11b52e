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
