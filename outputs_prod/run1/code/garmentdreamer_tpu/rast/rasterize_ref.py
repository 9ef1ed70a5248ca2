"""Brute-force reference triangle rasterizer: every pixel tests every face.

Testing oracle for the tiled kernel in :mod:`.rasterize` (the same role
rasterize_ref plays for the splat rasterizer). O(H*W*F) -- fixture meshes only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rasterize import _edge, screen_xy

__all__ = ["rasterize_brute"]


def rasterize_brute(clip, faces, height, width):
    """(H, W) int32 face id, -1 background. Same coverage/z rules as the
    tiled kernel."""
    w = clip[:, 3]
    valid_v = w > 1e-6
    sxy = screen_xy(jnp.where(valid_v[:, None], clip, 1.0), height, width)
    zw = clip[:, 2] / jnp.where(valid_v, w, 1.0)
    tri_ok = valid_v[faces[:, 0]] & valid_v[faces[:, 1]] & valid_v[faces[:, 2]]

    a, b, c = sxy[faces[:, 0]], sxy[faces[:, 1]], sxy[faces[:, 2]]  # (F,2)
    za, zb, zc = zw[faces[:, 0]], zw[faces[:, 1]], zw[faces[:, 2]]

    py, px = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32) + 0.5,
        jnp.arange(width, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    BIG = jnp.float32(3.4e38)

    def per_pixel(px_, py_):
        e0 = _edge(b, c, px_, py_)
        e1 = _edge(c, a, px_, py_)
        e2 = _edge(a, b, px_, py_)
        area = _edge(a, b, c[:, 0], c[:, 1])
        inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
        b0, b1, b2 = e0 * inv_area, e1 * inv_area, e2 * inv_area
        covered = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (jnp.abs(area) > 1e-12) & tri_ok
        z = b0 * za + b1 * zb + b2 * zc
        z = jnp.where(covered, z, BIG)
        win = jnp.argmin(z)
        return jnp.where(z[win] < BIG, win, -1).astype(jnp.int32)

    return jax.vmap(jax.vmap(per_pixel))(px, py)
