"""Full-pipeline driver test: launch CLI with tiny configs runs all four
stages end-to-end and produces the reference artifact layout."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from garmentdreamer_tpu.core import io as gio


@pytest.fixture(scope="module")
def tiny_configs(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg")
    (d / "gs.yaml").write_text(
        """
data:
  batch_size: 2
  height: 64
  width: 64
  eval_height: 64
  eval_width: 64
  n_test_views_horizontal: 4
  n_test_views_vertical: 2
system:
  max_steps: 3
  num_surface_pts: 2000
  num_pts_space: 0
  capacity: 4096
  max_per_tile: 64
  max_tiles_per_gaussian: 8
  densify_from: 10
  densify_until: 0
"""
    )
    (d / "deformer.yml").write_text(
        """
iterations_first: 2
iterations_second: 2
upsample_iterations: []
picked_views_first: [0, 8]
picked_views_second: [0, 1, 2, 3]
save_frequency: 0
"""
    )
    (d / "netf.yml").write_text(
        """
enhance: true
iters: 2
fit_tex_iters: 3
render_resolution: 64
texture_resolution: 64
batch_size_train: 2
reconstruction_picked_views: [0, 1, 2, 3, 4, 5, 6, 7]
"""
    )
    return d


def test_full_pipeline_tiny(tiny_configs, tmp_path):
    """python launch_garmentdreamer.py equivalent with --model_scale tiny."""
    from garmentdreamer_tpu.pipeline.launch import main

    # small sphere template
    t = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    zz = np.linspace(-0.9, 0.9, 8)
    verts, faces = [], []
    for z in zz:
        r = np.sqrt(max(1 - z * z, 1e-4))
        for a in t:
            verts.append((r * np.cos(a), r * np.sin(a), z))
    n = len(t)
    for i in range(len(zz) - 1):
        for j in range(n):
            a_, b_ = i * n + j, i * n + (j + 1) % n
            c_, d_ = (i + 1) * n + j, (i + 1) * n + (j + 1) % n
            faces.append((a_, b_, d_))
            faces.append((a_, d_, c_))
    tpl = tmp_path / "template.obj"
    gio.save_obj(
        str(tpl),
        gio.ObjMesh(
            vertices=np.array(verts, np.float32), faces=np.array(faces, np.int32)
        ),
    )

    save_dir = tmp_path / "trial"
    result = main(
        [
            "--template_path", str(tpl),
            "--prompt", "a blue denim skirt",
            "--gs_config", str(tiny_configs / "gs.yaml"),
            "--deformer_config", str(tiny_configs / "deformer.yml"),
            "--netf_config", str(tiny_configs / "netf.yml"),
            "--save_dir", str(save_dir),
            "--model_scale", "tiny",
        ]
    )

    # reference artifact layout (SURVEY.md section 0 dataflow table)
    assert os.path.isfile(save_dir / "cameras.json")
    renders = os.listdir(save_dir / "gs_rendered_rgba")
    assert len(renders) == 8
    normals = os.listdir(save_dir / "estimated_normals")
    assert len(normals) == 8
    assert os.path.isfile(save_dir / "last_3dgs.ply")
    assert os.path.isfile(save_dir / "last_pointcloud_with_color.ply")
    assert os.path.isfile(save_dir / "final_mesh.obj")
    assert os.path.isfile(result["final_mesh"])
    assert result["final_mesh"].endswith("final_mesh_finetuned.obj")
    with open(save_dir / "cameras.json") as f:
        cams = json.load(f)
    assert len(cams) == 8
    assert {"id", "img_name", "position", "rotation", "fx", "fy"} <= set(cams[0])
