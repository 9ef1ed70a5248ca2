"""network_gui viewer protocol + COLMAP converter CLI (VERDICT r2 missing-4;
reference gaussian_renderer/network_gui.py, gaussiansplatting/convert.py)."""

import json
import os
import socket
import threading

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_viewer_serves_sibr_protocol():
    import jax.numpy as jnp

    from garmentdreamer_tpu.core import cameras as cam
    from garmentdreamer_tpu.splat import state as state_mod
    from garmentdreamer_tpu.splat.viewer import NetworkGUI

    rs = np.random.RandomState(0)
    pts = rs.randn(200, 3).astype(np.float32) * 0.4
    cols = rs.uniform(0.1, 0.9, (200, 3)).astype(np.float32)
    st = state_mod.create_from_pcd(pts, cols, capacity=256)

    H = W = 32
    c = cam.gs_camera_from_spherical(10.0, 30.0, 2.5, float(np.deg2rad(60.0)), H, W)
    # client sends ROW-convention matrices with y/z columns negated
    # (the reference un-flips them, network_gui.py:74-77)
    wv = np.array(c.world_view, np.float32).T.copy()
    wv[:, 1] *= -1.0
    wv[:, 2] *= -1.0
    fp = np.array(c.full_proj, np.float32).T.copy()

    port = _free_port()
    gui = NetworkGUI(port=port, verify="/tmp/scene")

    result = {}

    def server():
        # poll until a client is served (handle returns after do_training)
        import time

        t0 = time.time()
        it = 0
        while not result.get("done") and time.time() - t0 < 280:
            gui.handle(st, it, 1000)
            it += 1
            time.sleep(0.05)

    th = threading.Thread(target=server, daemon=True)
    th.start()

    # generous timeout: the render path jit-compiles in interpret mode on
    # this 1-vCPU host before the first frame comes back
    cl = socket.create_connection(("127.0.0.1", port), timeout=300)
    msg = {
        "resolution_x": W, "resolution_y": H, "train": True,
        "fov_x": 2 * float(np.arctan(c.tanfovx)),
        "fov_y": 2 * float(np.arctan(c.tanfovy)),
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": False, "scaling_modifier": 1.0,
        "view_matrix": wv.reshape(-1).tolist(),
        "view_projection_matrix": fp.reshape(-1).tolist(),
    }
    payload = json.dumps(msg).encode()
    cl.sendall(len(payload).to_bytes(4, "little"))
    cl.sendall(payload)

    want = H * W * 3
    buf = b""
    while len(buf) < want + 4:
        chunk = cl.recv(65536)
        if not chunk:
            break
        buf += chunk
    img = np.frombuffer(buf[:want], np.uint8).reshape(H, W, 3)
    vlen = int.from_bytes(buf[want:want + 4], "little")
    while len(buf) < want + 4 + vlen:
        buf += cl.recv(65536)
    verify = buf[want + 4:want + 4 + vlen].decode("ascii")
    result["done"] = True
    cl.close()
    th.join(timeout=20)
    gui.close()

    assert verify == "/tmp/scene"
    # the cylinder-ish cloud must actually be visible in the render
    assert img.max() > 0 and img.std() > 1.0


def test_convert_colmap_missing_binary_message(tmp_path):
    from garmentdreamer_tpu.splat.convert_colmap import main

    src = tmp_path / "scene"
    (src / "input").mkdir(parents=True)
    rc = main(["-s", str(src), "--colmap_executable",
               str(tmp_path / "definitely_not_colmap")])
    assert rc == 1


def test_convert_colmap_resize_pyramid(tmp_path):
    import cv2

    from garmentdreamer_tpu.splat.convert_colmap import _make_resized

    src = tmp_path / "scene"
    (src / "images").mkdir(parents=True)
    im = (np.random.RandomState(0).rand(64, 48, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(src / "images" / "a.png"), im)

    _make_resized(str(src))
    for denom, sub in ((2, "images_2"), (4, "images_4"), (8, "images_8")):
        out = cv2.imread(str(src / sub / "a.png"))
        assert out.shape[:2] == (64 // denom, 48 // denom)
