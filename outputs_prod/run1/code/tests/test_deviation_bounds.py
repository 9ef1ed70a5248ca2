"""Quantified bounds for documented parity deviations (VERDICT r1 weak-8).

Each test pins a deviation from the reference to a measured, loss-relevant
bound so the deviation stays justified as the code evolves:

1. visibility supersampling 2x (ours, deformer/driver.py:101) vs the
   reference's 8x (deformer/core/renderer.py:104-126);
2. gs_check renders a fixed front view (systems/gaussiandreamer.py) vs the
   reference's validation-batch view (GaussianDreamer.py:290-325) -- a
   monitoring artifact only; asserted to never feed back into training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.core.cameras import gl_projection, mvp_from_c2w
from garmentdreamer_tpu.rast import vertex_visibility


def _sphere(n_u=24, n_v=16, r=0.8):
    us = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    vs = np.linspace(0.1, np.pi - 0.1, n_v)
    verts = []
    for u in us:
        for v in vs:
            verts.append(
                (r * np.sin(v) * np.cos(u), r * np.cos(v), r * np.sin(v) * np.sin(u))
            )
    faces = []
    for i in range(n_u):
        for j in range(n_v - 1):
            a = i * n_v + j
            b = ((i + 1) % n_u) * n_v + j
            faces.append((a, b, a + 1))
            faces.append((b, b + 1, a + 1))
    return np.array(verts, np.float32), np.array(faces, np.int32)


def _orbit_mvps(n_views=4, dist=2.5, fovy=0.8):
    proj = gl_projection(np.full(n_views, fovy), 1.0, 0.1, 10.0)
    mvps = []
    for i in range(n_views):
        a = 2 * np.pi * i / n_views
        eye = np.array([dist * np.cos(a), 0.3, dist * np.sin(a)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        mvps.append(mvp_from_c2w(c2w, proj[i]))
    return jnp.asarray(np.stack(mvps))


def test_visibility_2x_matches_8x_supersampling():
    """The 2x face-id pass finds (almost) the same visible-vertex set as the
    reference's 8x: only sub-pixel slivers can differ, and missing a vertex
    only delays its optimization by one iteration. Bound: >= 98% agreement
    and NO vertex visible at 2x while hidden at 8x beyond the same slack."""
    verts, faces = _sphere()
    mvps = _orbit_mvps()
    H = W = 64

    vis2 = np.asarray(
        vertex_visibility(jnp.asarray(verts), jnp.asarray(faces), mvps, H, W,
                          len(verts), upsample=2)
    )
    vis8 = np.asarray(
        vertex_visibility(jnp.asarray(verts), jnp.asarray(faces), mvps, H, W,
                          len(verts), upsample=8)
    )
    agree = (vis2 == vis8).mean()
    assert agree >= 0.98, f"2x vs 8x visibility agreement {agree:.3f}"
    # 8x can only ADD sub-pixel hits; 2x must not hallucinate visibility
    false_pos = (vis2 & ~vis8).mean()
    assert false_pos <= 0.01, f"2x marked {false_pos:.3%} vertices 8x missed"
    # sanity: most of a sphere viewed from a 4-view orbit is visible
    assert vis8.mean() > 0.5


def test_gs_check_is_monitoring_only(tmp_path):
    """The gs_check render must not mutate training state (it deviates from
    the reference's validation-batch view, which is acceptable only while it
    stays a pure observer)."""
    from garmentdreamer_tpu.data.cameras import RandomCameraConfig
    from garmentdreamer_tpu.splat import state as state_mod
    from garmentdreamer_tpu.systems.gaussiandreamer import (
        GaussianDreamerConfig,
        GaussianDreamerSystem,
    )

    rs = np.random.RandomState(0)
    pts = rs.randn(100, 3).astype(np.float32) * 0.3
    cols = rs.rand(100, 3).astype(np.float32)
    st = state_mod.create_from_pcd(pts, cols, capacity=128)
    cfg = GaussianDreamerConfig(capacity=128, max_per_tile=128,
                                max_tiles_per_gaussian=8)
    dcfg = RandomCameraConfig(eval_height=32, eval_width=32)
    system = GaussianDreamerSystem(cfg, dcfg)

    before = [np.asarray(x).copy() for x in jax.tree.leaves(st.params)]
    system._save_gs_check(st, str(tmp_path / "gs_check"), 0)
    after = [np.asarray(x) for x in jax.tree.leaves(st.params)]
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)
    import os

    assert os.path.exists(tmp_path / "gs_check" / "iter_0.png")
