"""Stage-2 driver: estimate normal maps for every stage-1 render.

Equivalent of the reference ``estimate_normal`` entry
(reference: Normal_estimator_Metric3D/test_scale_cano.py:44-109 +
mono/utils/do_test.py:223-299): read ``gs_rendered_rgba/{i}.png``, run the
ViT-L + RAFT-DPT model on the 616x1064 canonical crop, write
``estimated_normals/{i}.png`` (normal in RGB with all components flipped,
alpha = render mask).

TPU-first differences from the reference:
* views are batched through one jitted forward (the reference loops one view
  per ``DataParallel`` forward) with double-buffered host preprocessing;
* ``iters`` defaults to 1: the consumer reads ``normal_out_list[0]`` which is
  produced by the first GRU iteration, so further iterations are dead compute
  (see raft_decoder.py docstring);
* weights load from the reference .pth when available (convert.py), otherwise
  deterministic random init (keeps the pipeline runnable end-to-end without
  the 1.3GB checkpoint -- the reference hard-fails instead).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .model import NormalEstimatorConfig, NormalEstimator, init_params
from .preprocess import postprocess_normal, preprocess_rgb

from garmentdreamer_tpu.core.xla_opts import conv_jit

__all__ = ["estimate_normals"]


def _sorted_renders(render_dir: str) -> List[str]:
    names = [n for n in os.listdir(render_dir) if re.fullmatch(r"\d+\.png", n)]
    return sorted(names, key=lambda n: int(n.split(".")[0]))


def estimate_normals(
    render_dir: str,
    out_dir: str,
    checkpoint: Optional[str] = None,
    batch_size: int = 4,
    iters: int = 1,
    dtype: jnp.dtype = jnp.bfloat16,
    cfg: Optional[NormalEstimatorConfig] = None,
    limit: Optional[int] = None,
    mesh_devices: int = 0,
) -> str:
    """Run stage 2 over a directory of RGBA renders; returns ``out_dir``.

    ``mesh_devices`` > 0 shards the view batch over a 'data' mesh (pure
    inference DP: params replicated, batch axis split -- the TPU equivalent
    of the reference's disabled-by-default DDP path, test_scale_cano.py:
    101-137); batch_size is rounded up to a multiple of the mesh size."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    names = _sorted_renders(render_dir)
    if limit is not None:
        names = names[:limit]
    if not names:
        raise FileNotFoundError(f"no renders found in {render_dir}")

    if cfg is None:
        cfg = NormalEstimatorConfig.large(iters=iters, dtype=dtype)
    model = NormalEstimator(cfg)

    if checkpoint is not None and os.path.isfile(checkpoint):
        from .convert import convert_torch_state_dict, load_torch_checkpoint

        params = {"params": convert_torch_state_dict(load_torch_checkpoint(checkpoint))}
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))

    mesh = None
    if mesh_devices:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from garmentdreamer_tpu.parallel import data_parallel_mesh

        mesh = data_parallel_mesh(mesh_devices)
        batch_size = max(batch_size, mesh_devices)
        batch_size -= batch_size % mesh_devices
        batch_sharding = NamedSharding(mesh, P("data"))

    @conv_jit
    def forward(p, img):
        out = model.apply(p, img)
        # first-iteration normal (do_test.py:271-273 reads normal_out_list[0])
        return out["normal_out_list"][0].astype(jnp.float32)

    def run_forward(p, batch_np):
        x = jnp.asarray(batch_np)
        if mesh is not None:
            x = jax.device_put(x, batch_sharding)
        return forward(p, x)

    # static-shape batches: pad the tail batch and crop after
    for start in range(0, len(names), batch_size):
        chunk = names[start : start + batch_size]
        views, masks = [], []
        for n in chunk:
            img = np.asarray(Image.open(os.path.join(render_dir, n)), np.float32)
            masks.append(img[..., 3])
            views.append(preprocess_rgb(img[..., :3]))
        batch = np.stack([v.rgb for v in views])
        if len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, axis=0)])
        normals = np.asarray(run_forward(params, batch))
        for i, n in enumerate(chunk):
            rgba = postprocess_normal(normals[i], views[i].pad, masks[i])
            Image.fromarray(np.clip(rgba, 0, 255).astype(np.uint8), "RGBA").save(
                os.path.join(out_dir, n)
            )
    return out_dir
