import numpy as np
import pytest

from garmentdreamer_tpu.core import cameras as cam


def test_fov_focal_roundtrip():
    f = cam.fov2focal(np.deg2rad(70.0), 1024)
    assert f == pytest.approx(731.21, abs=0.01)  # Metric3D's default intrinsic
    assert cam.focal2fov(f, 1024) == pytest.approx(np.deg2rad(70.0))


def test_spherical_positions_convention():
    # x back / y right / z up: elev=0, azim=0 -> +x; azim=90 -> +y; elev=90 -> +z
    p = cam.spherical_positions(np.array([0.0, 0.0, 90.0]), np.array([0.0, 90.0, 0.0]), np.array([2.0, 2.0, 2.0]))
    np.testing.assert_allclose(p[0], [2, 0, 0], atol=1e-6)
    np.testing.assert_allclose(p[1], [0, 2, 0], atol=1e-6)
    np.testing.assert_allclose(p[2], [0, 0, 2], atol=1e-5)


def test_lookat_c2w_orthonormal_and_position():
    pos = cam.spherical_positions(np.array([30.0]), np.array([45.0]), np.array([3.5]))
    c2w = cam.lookat_c2w(pos)[0]
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(c2w[:3, 3], pos[0], atol=1e-6)
    # third column is -lookat = normalized(position - center)
    np.testing.assert_allclose(R[:, 2], pos[0] / np.linalg.norm(pos[0]), atol=1e-5)


def test_c2w_3dgs_rotation_block_is_rotation():
    c2w = cam.c2w_3dgs_from_spherical(np.array([15.0]), np.array([60.0]), np.array([3.5]))[0]
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


@pytest.mark.parametrize("elev,azim", [(0.0, 0.0), (15.0, 60.0), (-45.0, 200.0), (89.0, 350.0)])
def test_gs_camera_invariants(elev, azim):
    dist, fovy = 3.5, np.deg2rad(70.0)
    c = cam.gs_camera_from_spherical(elev, azim, dist, fovy, 64, 64)
    # world->view maps the camera center to the view-space origin
    ctr_h = np.concatenate([c.camera_center, [1.0]])
    np.testing.assert_allclose((c.world_view @ ctr_h)[:3], 0.0, atol=1e-4)
    # camera sits at the requested distance from the scene origin
    assert np.linalg.norm(c.camera_center) == pytest.approx(dist, abs=1e-4)
    # world origin projects to the image center with positive view depth
    o_clip = c.full_proj @ np.array([0, 0, 0, 1.0])
    ndc = o_clip[:3] / o_clip[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-4)
    o_view = c.world_view @ np.array([0, 0, 0, 1.0])
    assert o_view[2] == pytest.approx(dist, abs=1e-4)  # +z forward in view space


def test_gs_projection_znear_zfar_mapping():
    P = cam.gs_projection(0.01, 100.0, np.deg2rad(60.0), np.deg2rad(60.0))
    # a point on the near plane maps to ndc z=0, far plane to z=1
    for z, expect in [(0.01, 0.0), (100.0, 1.0)]:
        clip = P @ np.array([0, 0, z, 1.0])
        assert clip[2] / clip[3] == pytest.approx(expect, abs=1e-5)


def test_turntable_is_407_views():
    elev, azim = cam.turntable_angles()
    assert elev.shape == (407,) and azim.shape == (407,)
    # first row at elevation -90, last at +90; azimuth sweeps 0..360 in each row
    assert elev[0] == -90.0 and elev[-1] == 90.0
    np.testing.assert_allclose(azim[:37], np.linspace(0, 360, 37), atol=1e-5)
    np.testing.assert_allclose(azim[37:74], np.linspace(0, 360, 37), atol=1e-5)


def test_cameras_json_entry_fields(tmp_path):
    pos = cam.spherical_positions(np.array([10.0]), np.array([20.0]), np.array([3.5]))
    c2w = cam.lookat_c2w(pos)[0]
    e = cam.camera_json_entry(5, c2w, np.deg2rad(70.0), 1024, 1024)
    assert set(e) == {"id", "img_name", "width", "height", "position", "rotation", "fy", "fx"}
    assert e["id"] == 5 and e["img_name"] == "5"
    assert e["fx"] == pytest.approx(e["fy"])  # square pixels at H == W
    np.testing.assert_allclose(np.array(e["rotation"]), -c2w[:3, :3], atol=1e-6)
    p = tmp_path / "cameras.json"
    cam.save_cameras_json(str(p), [e])
    assert cam.load_cameras_json(str(p))[0]["id"] == 5


def test_gl_projection_and_mvp():
    fovy = np.array([np.deg2rad(70.0)])
    P = cam.gl_projection(fovy, 1.0, 0.1, 1000.0)[0]
    assert P[1, 1] == pytest.approx(-1.0 / np.tan(np.deg2rad(35.0)))
    pos = cam.spherical_positions(np.array([0.0]), np.array([0.0]), np.array([2.0]))
    c2w = cam.lookat_c2w(pos)
    mvp = cam.mvp_from_c2w(c2w, cam.gl_projection(fovy, 1.0, 0.1, 1000.0))[0]
    clip = mvp @ np.array([0, 0, 0, 1.0])
    ndc = clip / clip[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-6)
