import numpy as np
import pytest

from garmentdreamer_tpu.core import io as gio


def test_gaussian_ply_roundtrip(tmp_path):
    P, deg = 17, 0
    rng = np.random.default_rng(0)
    d = {
        "xyz": rng.normal(size=(P, 3)).astype(np.float32),
        "features_dc": rng.normal(size=(P, 1, 3)).astype(np.float32),
        "features_rest": np.zeros((P, (deg + 1) ** 2 - 1, 3), np.float32),
        "opacity": rng.normal(size=(P, 1)).astype(np.float32),
        "scaling": rng.normal(size=(P, 3)).astype(np.float32),
        "rotation": rng.normal(size=(P, 4)).astype(np.float32),
    }
    path = tmp_path / "g.ply"
    gio.save_gaussian_ply(str(path), **d)
    back = gio.load_gaussian_ply(str(path), max_sh_degree=deg)
    for k in d:
        np.testing.assert_allclose(back[k], d[k], atol=1e-6, err_msg=k)


def test_gaussian_ply_header_matches_3dgs_layout(tmp_path):
    path = tmp_path / "g.ply"
    gio.save_gaussian_ply(
        str(path),
        xyz=np.zeros((2, 3), np.float32),
        features_dc=np.zeros((2, 1, 3), np.float32),
        features_rest=np.zeros((2, 0, 3), np.float32),
        opacity=np.zeros((2, 1), np.float32),
        scaling=np.zeros((2, 3), np.float32),
        rotation=np.zeros((2, 4), np.float32),
    )
    header = path.read_bytes().split(b"end_header")[0].decode()
    assert "format binary_little_endian 1.0" in header
    order = [l.split()[-1] for l in header.splitlines() if l.startswith("property")]
    assert order == [
        "x", "y", "z", "nx", "ny", "nz",
        "f_dc_0", "f_dc_1", "f_dc_2",
        "opacity", "scale_0", "scale_1", "scale_2",
        "rot_0", "rot_1", "rot_2", "rot_3",
    ]


def test_sh1_ply_roundtrip_feature_ordering(tmp_path):
    # with SH degree 1 the f_rest flattening is channel-major; verify roundtrip
    P = 3
    rest = np.arange(P * 3 * 3, dtype=np.float32).reshape(P, 3, 3)
    path = tmp_path / "g.ply"
    gio.save_gaussian_ply(
        str(path),
        xyz=np.zeros((P, 3), np.float32),
        features_dc=np.zeros((P, 1, 3), np.float32),
        features_rest=rest,
        opacity=np.zeros((P, 1), np.float32),
        scaling=np.zeros((P, 3), np.float32),
        rotation=np.zeros((P, 4), np.float32),
    )
    back = gio.load_gaussian_ply(str(path), max_sh_degree=1)
    np.testing.assert_allclose(back["features_rest"], rest)


def test_color_ply(tmp_path):
    path = tmp_path / "c.ply"
    gio.save_color_ply(str(path), np.zeros((4, 3), np.float32), np.full((4, 3), 0.5, np.float32))
    raw = path.read_bytes()
    assert b"property uchar red" in raw


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    path = tmp_path / "m.obj"
    gio.save_obj(str(path), gio.ObjMesh(vertices=verts, faces=faces))
    m = gio.load_obj(str(path))
    np.testing.assert_allclose(m.vertices, verts, atol=1e-6)
    np.testing.assert_array_equal(m.faces, faces)


def test_obj_quads_and_uvs(tmp_path):
    path = tmp_path / "q.obj"
    path.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n"
    )
    m = gio.load_obj(str(path))
    assert m.faces.shape == (2, 3)  # quad fan-triangulated
    assert m.uv_faces.shape == (2, 3)
    np.testing.assert_array_equal(m.faces[0], [0, 1, 2])
    np.testing.assert_array_equal(m.faces[1], [0, 2, 3])


def test_rgba_png_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    alpha = (rng.uniform(size=(8, 8)) > 0.5).astype(np.float32)
    p = tmp_path / "x.png"
    gio.save_rgba_png(str(p), rgb, alpha)
    rgb2, a2 = gio.load_rgba_png(str(p))
    assert np.abs(rgb2 - rgb).max() < 1 / 255 + 1e-6
    np.testing.assert_array_equal(a2 > 0.5, alpha > 0.5)
