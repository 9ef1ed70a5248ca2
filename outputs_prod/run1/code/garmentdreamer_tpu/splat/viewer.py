"""SIBR-compatible live network viewer for splat training.

Rebuild of the reference's ``network_gui`` socket viewer (reference:
gaussiansplatting/gaussian_renderer/network_gui.py:1-106, polled from the
vanilla train loop at train.py:52-66): the SIBR remote client connects over
TCP, streams camera messages (length-prefixed little-endian JSON), and
receives raw RGB bytes + a length-prefixed verify string back.

Wire protocol parity:
* request: 4-byte LE length + JSON with resolution_x/y, train, fov_x/y,
  z_near/z_far, shs_python, rot_scale_python, keep_alive, scaling_modifier,
  view_matrix (16 floats), view_projection_matrix (16 floats);
* the view/projection matrices get their y/z COLUMNS negated (the reference's
  CUDA-convention flip, network_gui.py:74-77);
* response: H*W*3 u8 RGB bytes (only when resolution nonzero) followed by
  4-byte LE length + the source-path verify string.

The renderer side runs our jitted packed fast path; one jit cache entry per
requested resolution.
"""

from __future__ import annotations

import json
import socket
import traceback
from functools import partial
from typing import Optional

import numpy as np

__all__ = ["NetworkGUI"]


class NetworkGUI:
    """Non-blocking viewer server; poll :meth:`handle` from the train loop
    exactly like the reference polls network_gui.try_connect()/receive()."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6009,
                 verify: str = ""):
        self.verify = verify
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None
        self._render_cache = {}

    # -- wire helpers ------------------------------------------------------
    def _try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            self.conn.settimeout(None)
            print(f"[viewer] connected by {addr}", flush=True)
        except (BlockingIOError, socket.timeout, OSError):
            pass

    def _read(self):
        n = int.from_bytes(self.conn.recv(4), "little")
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client closed")
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def _send(self, image_bytes: Optional[bytes]):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(self.verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(self.verify, "ascii"))

    # -- rendering ---------------------------------------------------------
    def _render_fn(self, H: int, W: int):
        key = (H, W)
        if key not in self._render_cache:
            import jax
            import jax.numpy as jnp

            from garmentdreamer_tpu.splat.budgets import classes_for
            from garmentdreamer_tpu.splat.render import render_view

            @partial(jax.jit, static_argnames=())
            def fn(params, stats, cam, bg, scaling_modifier):
                from garmentdreamer_tpu.splat.state import GaussianState

                st = GaussianState(params=params, stats=stats,
                                   active_sh_degree=0, max_sh_degree=0)
                out = render_view(
                    st, cam, bg, H, W,
                    scaling_modifier=scaling_modifier,
                    fast=True, payload_dtype="packed",
                    classes=classes_for(H, W, params.xyz.shape[0]),
                )
                return jnp.clip(out["render"], 0.0, 1.0)

            self._render_cache[key] = fn
        return self._render_cache[key]

    def _render(self, st, msg) -> Optional[bytes]:
        import jax.numpy as jnp

        H, W = int(msg["resolution_y"]), int(msg["resolution_x"])
        if H == 0 or W == 0:
            return None
        H -= H % 16
        W -= W % 16
        view = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        proj = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        # CUDA-convention column flips (network_gui.py:74-77); the reference
        # stores matrices transposed (row-vector convention), ours are
        # column-vector -- transpose after the flip
        view[:, 1] *= -1.0
        view[:, 2] *= -1.0
        wv = view.T
        fp = proj.T
        cam_center = np.linalg.inv(wv)[:3, 3]
        fovx, fovy = float(msg["fov_x"]), float(msg["fov_y"])
        cam = {
            "world_view": jnp.asarray(wv),
            "full_proj": jnp.asarray(fp),
            "camera_center": jnp.asarray(cam_center),
            "tanfov": jnp.asarray(
                [np.tan(fovx * 0.5), np.tan(fovy * 0.5)], np.float32
            ),
        }
        bg = jnp.ones(3, jnp.float32)
        img = self._render_fn(H, W)(
            st.params, st.stats, cam, bg, float(msg.get("scaling_modifier", 1.0))
        )
        return (np.asarray(img) * 255).astype(np.uint8).tobytes()

    # -- train-loop hook ---------------------------------------------------
    def handle(self, st, iteration: int, max_iterations: int) -> None:
        """Serve any connected client; mirrors train.py:52-66 semantics
        (keep serving while keep_alive clients don't request training)."""
        if self.conn is None:
            self._try_connect()
        while self.conn is not None:
            try:
                msg = self._read()
                img_bytes = self._render(st, msg)
                self._send(img_bytes)
                do_training = bool(msg.get("train", True))
                keep_alive = bool(msg.get("keep_alive", False))
                if do_training and (iteration < max_iterations or not keep_alive):
                    break
            except Exception:
                traceback.print_exc()
                try:
                    self.conn.close()
                except OSError:
                    pass
                self.conn = None

    def close(self):
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
