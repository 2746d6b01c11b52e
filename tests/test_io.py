import numpy as np
import pytest

from meshopticalflow_tpu.io import (
    read_png_rgb, write_png_rgb, read_ply, read_triangle_mesh,
    write_ply_colored, write_ply_textured, write_ply_face_vectors,
    read_vector, write_vector,
)


def test_ply_colored_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0.5]], np.float64)
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.float64)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    for fmt in ("ascii", "binary_little_endian"):
        path = str(tmp_path / f"mesh_{fmt}.ply")
        write_ply_colored(path, verts, colors, faces, fmt=fmt)
        m = read_triangle_mesh(path)
        np.testing.assert_allclose(m.vertices, verts, atol=1e-6)
        np.testing.assert_allclose(m.colors, colors)
        np.testing.assert_array_equal(m.faces, faces)


def test_ply_textured_roundtrip(tmp_path):
    verts = np.random.default_rng(0).normal(size=(5, 3))
    faces = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    uvs = np.random.default_rng(1).uniform(size=(2, 3, 2))
    for fmt in ("ascii", "binary"):
        path = str(tmp_path / f"tex_{fmt}.ply")
        write_ply_textured(path, verts, faces, uvs, fmt=fmt)
        m = read_triangle_mesh(path)
        np.testing.assert_array_equal(m.faces, faces)
        np.testing.assert_allclose(m.face_uvs, uvs, atol=1e-6)


def test_ply_face_vectors(tmp_path):
    verts = np.zeros((3, 3))
    faces = np.array([[0, 1, 2]], np.int32)
    vf = np.array([[0.5, -1.0, 2.0]])
    path = str(tmp_path / "vf.ply")
    write_ply_face_vectors(path, verts, faces, vf)
    data = read_ply(path)
    np.testing.assert_allclose(
        np.stack([data["face"][k] for k in ("vx", "vy", "vz")], 1), vf, atol=1e-6)


def test_reference_example_mesh_loads():
    m = read_triangle_mesh("/root/reference/Example/mesh.ply")
    assert m.vertices.shape == (20000, 3)
    assert m.faces.shape == (40000, 3)
    assert m.face_uvs.shape == (40000, 3, 2)
    assert m.face_uvs.min() >= 0 and m.face_uvs.max() <= 1


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(2).integers(0, 256, (17, 23, 3), dtype=np.uint8)
    path = str(tmp_path / "img.png")
    write_png_rgb(path, img)
    np.testing.assert_array_equal(read_png_rgb(path), img)
    assert read_png_rgb("/root/reference/Example/A.png").shape == (388, 388, 3)


def test_binary_vector_roundtrip(tmp_path):
    path = str(tmp_path / "v.bin")
    vecs = np.random.default_rng(3).normal(size=(7, 2))
    write_vector(path, vecs)
    np.testing.assert_allclose(read_vector(path, width=2), vecs)


def test_grid_roundtrip(tmp_path):
    """Misha Grid binary format: int resX, int resY, row-major payload."""
    import numpy as np
    from meshopticalflow_tpu.io.binio import read_grid, write_grid
    rng = np.random.default_rng(0)
    g = rng.standard_normal((5, 7))
    path = str(tmp_path / "g.bin")
    write_grid(path, g)
    back = read_grid(path)
    np.testing.assert_array_equal(back, g)
    # header layout: two little-endian int32 (resX first)
    raw = np.fromfile(path, "<i4", 2)
    assert raw[0] == 7 and raw[1] == 5
    g3 = rng.standard_normal((4, 3, 3)).astype("<f8")
    write_grid(str(tmp_path / "g3.bin"), g3)
    np.testing.assert_array_equal(read_grid(str(tmp_path / "g3.bin"), channels=3), g3)
