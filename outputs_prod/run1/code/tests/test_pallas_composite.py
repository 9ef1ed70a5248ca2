"""Pallas compositor parity vs the XLA tile path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from garmentdreamer_tpu.core import cameras as cam
from garmentdreamer_tpu.splat import rasterize as rmod
from garmentdreamer_tpu.splat import state as state_mod
from garmentdreamer_tpu.splat.pallas_composite import composite_tiles_pallas
from garmentdreamer_tpu.splat.project import project_gaussians


def _scene_and_proj(n=300, H=64, W=64, seed=0):
    rs = np.random.RandomState(seed)
    pts = rs.randn(n, 3).astype(np.float32) * 0.4
    cols = rs.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    st = state_mod.create_from_pcd(pts, cols, capacity=512)
    c = cam.gs_camera_from_spherical(15.0, 30.0, 2.5, float(np.deg2rad(60.0)), H, W)
    proj = project_gaussians(
        xyz=st.params.xyz, scaling=st.get_scaling(), rotation_q=st.params.rotation,
        opacity=st.get_opacity(), shs=st.get_features(), sh_degree=0,
        world_view=jnp.asarray(c.world_view), full_proj=jnp.asarray(c.full_proj),
        camera_center=jnp.asarray(c.camera_center),
        tanfovx=float(c.tanfovx), tanfovy=float(c.tanfovy), height=H, width=W,
    )
    return proj, H, W


def _sorted_instances(proj, H, W, R=8):
    """Replicate rasterize_tiled's fused payload sort (same code path inputs)."""
    tiles_x = W // rmod.TILE
    n_tiles = tiles_x * (H // rmod.TILE)
    means2d = jax.lax.stop_gradient(proj.means2d)
    C = means2d.shape[0]
    visible = proj.radii > 0
    x0, y0, x1, y1 = rmod._tile_rect(
        means2d, jnp.where(visible, proj.radii, 0), tiles_x, H // rmod.TILE
    )
    w = x1 - x0
    count = jnp.where(visible, w * (y1 - y0), 0)
    slot = jnp.arange(R, dtype=jnp.int32)
    w_safe = jnp.maximum(w, 1)[:, None]
    tx = x0[:, None] + slot[None, :] % w_safe
    ty = y0[:, None] + slot[None, :] // w_safe
    valid = slot[None, :] < jnp.minimum(count, R)[:, None]
    tile_id = jnp.where(valid, ty * tiles_x + tx, n_tiles).astype(jnp.int32)
    opac_v = jnp.where(proj.radii > 0, proj.opacities, 0.0)

    def bcast(col):
        return jnp.broadcast_to(col[:, None], (C, R)).reshape(-1)

    ops = (
        tile_id.reshape(-1), bcast(jax.lax.stop_gradient(proj.depths)),
        bcast(proj.means2d[:, 0]), bcast(proj.means2d[:, 1]),
        bcast(proj.conics[:, 0]), bcast(proj.conics[:, 1]), bcast(proj.conics[:, 2]),
        bcast(proj.colors[:, 0]), bcast(proj.colors[:, 1]), bcast(proj.colors[:, 2]),
        jnp.where(valid, opac_v[:, None], 0.0).reshape(-1),
        bcast(proj.depths),
    )
    so = jax.lax.sort(ops, num_keys=2, is_stable=False)
    starts = jnp.searchsorted(so[0], jnp.arange(n_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    return starts, jnp.stack(so[2:], axis=0), n_tiles, tiles_x


class TestPallasComposite:
    def test_matches_xla_tiles(self):
        """Interpret-mode kernel vs rasterize_tiled on a scene whose tiles all
        fit the K window (so both paths see identical instance sets)."""
        proj, H, W = _scene_and_proj()
        bg = jnp.asarray([1.0, 1.0, 1.0])

        img_x, a_x, d_x, _, _nh = rmod.rasterize_tiled(
            proj, H, W, bg, max_tiles_per_gaussian=8, max_per_tile=384
        )

        starts, attrs_t, n_tiles, tiles_x = _sorted_instances(proj, H, W, R=8)
        occ = np.diff(np.asarray(starts))
        assert occ.max() <= 384, "fixture too dense for the parity premise"

        with pltpu.force_tpu_interpret_mode():
            out = composite_tiles_pallas(starts, attrs_t, bg, n_tiles, tiles_x, K=384)
        o = np.asarray(out).reshape(tiles_x, tiles_x, 5, 16, 16)
        img_p = np.transpose(o[:, :, 0:3], (0, 3, 1, 4, 2)).reshape(H, W, 3)
        a_p = np.transpose(o[:, :, 3], (0, 2, 1, 3)).reshape(H, W)

        np.testing.assert_allclose(img_p, np.asarray(img_x), atol=2e-3)
        np.testing.assert_allclose(a_p, np.asarray(a_x), atol=2e-3)
        # scene actually covers something
        assert (a_p > 0.1).mean() > 0.05
