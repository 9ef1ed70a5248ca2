"""End-to-end smoke test for stage 1: template -> SDS steps -> ring export.

Tiny everything (64^2 renders, 2-block UNet, 500-point cloud) but the full
wiring: render -> guidance -> grads -> Adam -> densify -> artifact export.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from garmentdreamer_tpu.core.io import ObjMesh, save_obj
from garmentdreamer_tpu.data.cameras import RandomCameraConfig
from garmentdreamer_tpu.guidance import (
    AutoencoderKL,
    PromptEmbeddings,
    SDSConfig,
    SDSGuidance,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from garmentdreamer_tpu.systems.gaussiandreamer import (
    GaussianDreamerConfig,
    GaussianDreamerSystem,
)


@pytest.fixture(scope="module")
def template_obj(tmp_path_factory):
    p = tmp_path_factory.mktemp("tpl") / "cube.obj"
    # unit cube
    v = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        np.float32,
    ) - 0.5
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    save_obj(str(p), ObjMesh(vertices=v, faces=f))
    return str(p)


def _tiny_guidance():
    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg)
    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    latent, img = 8, 32
    up = unet.init(
        jax.random.key(0),
        jnp.zeros((1, latent, latent, 4)),
        jnp.array([0]),
        jnp.zeros((1, 7, ucfg.cross_attention_dim)),
    )
    vp = vae.init(
        jax.random.key(1), jnp.zeros((1, img, img, 3)), jax.random.key(2)
    )

    def unet_apply(params, lat, t, ctx):
        return unet.apply(params, lat, t, ctx)

    def vae_encode(params, images, rng):
        return vae.apply(params, images, rng, method=AutoencoderKL.sample_latents)

    g = SDSGuidance(
        SDSConfig(latent_size=latent, image_size=img, guidance_scale=7.5),
        unet_apply, up, vae_encode, vp,
    )
    emb = PromptEmbeddings(
        text_vd=jnp.ones((4, 7, ucfg.cross_attention_dim)) * 0.1,
        uncond_vd=jnp.zeros((4, 7, ucfg.cross_attention_dim)),
        text=jnp.ones((7, ucfg.cross_attention_dim)) * 0.1,
        uncond=jnp.zeros((7, ucfg.cross_attention_dim)),
    )
    return g, emb


def test_stage1_end_to_end(template_obj, tmp_path):
    guidance, emb = _tiny_guidance()
    cfg = GaussianDreamerConfig(
        num_pts_space=2000,
        num_surface_pts=400,
        capacity=1024,
        max_steps=3,
        densify_from=0,
        densify_until=10,
        densify_interval=2,
        max_tiles_per_gaussian=16,
        max_per_tile=128,
    )
    data_cfg = RandomCameraConfig(
        height=64, width=64, batch_size=2,
        eval_height=64, eval_width=64,
        n_test_views_horizontal=3, n_test_views_vertical=2,
    )
    sys = GaussianDreamerSystem(cfg, data_cfg, guidance, emb)
    st = sys.init_state(template_obj)
    n0 = int(st.n_active())
    assert n0 >= 400  # surface + some stuffed points

    losses = []
    st, opt_state = sys.fit(
        st, callback=lambda step, s, aux: losses.append(float(aux["loss"]))
    )
    assert len(losses) == 3
    assert all(np.isfinite(l) for l in losses)

    save_dir = str(tmp_path / "out")
    sys.render_ring(st, save_dir, chunk=3)

    # artifact contract (SURVEY.md section 0 table)
    pngs = sorted(os.listdir(os.path.join(save_dir, "gs_rendered_rgba")))
    assert len(pngs) == 6  # 3 x 2 ring
    with open(os.path.join(save_dir, "cameras.json")) as f:
        cams = json.load(f)
    assert len(cams) == 6
    assert {"id", "img_name", "width", "height", "position", "rotation", "fy", "fx"} <= set(cams[0])
    assert os.path.exists(os.path.join(save_dir, "last_3dgs.ply"))
    assert os.path.exists(os.path.join(save_dir, "last_pointcloud_with_color.ply"))

    # ply loads back
    from garmentdreamer_tpu.core.io import load_gaussian_ply

    d = load_gaussian_ply(os.path.join(save_dir, "last_3dgs.ply"), max_sh_degree=0)
    assert d["xyz"].shape[0] == int(st.n_active())
