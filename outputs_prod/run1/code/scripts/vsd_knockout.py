"""Knockout attribution of the stage-4 VSD refinement step (VERDICT r4 next-3).

scripts/vsd_breakdown.py times each component as a STANDALONE program; those
numbers summed to ~820 ms/it while the real composed step measured ~1172
ms/it (scripts/bench_stages.py) -- ~350 ms/it lives in composition effects
the standalone view cannot see (scheduling, fusion boundaries, scan/cond
overhead). This harness measures the REAL `NeTFTrainer.train_vsd` loop with
individual components knocked out, so each component's cost is the delta
against the full step *in situ*:

* ``no_lora``    -- cfg.K2 > iters: the per-step LoRA v-pred update never runs
* ``no_texapply``-- cfg.batch_size_train > iters: texture Adam never applies
* ``vae_only``   -- guidance.train_step stub: render -> VAE encode fwd+bwd,
                    but no frozen-UNet CFG pair / LoRA forward / schedule ops
* ``render_only``-- train_step stub: loss = image.sum() (no VAE at all);
                    LoRA update still runs on placeholder latents
* ``cover0/cover375`` -- vsd_cover_frac sweep around the 0.625 default

All variants reuse the bench_stages delta method: every run is an exact
multiple of one vsd_scan_chunk so the delta replays a single compiled
executable and fixed costs cancel. One JSON line per variant.

Usage: python scripts/vsd_knockout.py [--variants full,no_lora,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench_stages import _make_vsd_stack, _sphere_obj  # noqa: E402

VCH = 25  # one scan-chunk; all runs are exact multiples


def emit(rec):
    print(json.dumps(rec), flush=True)


def _sample_dir(H=1024, n_views=8):
    from garmentdreamer_tpu.core import cameras as ccam, io as gio
    from garmentdreamer_tpu.data.cameras import RandomCameraConfig, test_ring_cameras

    tmp = tempfile.mkdtemp(prefix="vsd_knockout_")
    mesh_path = os.path.join(tmp, "final_mesh.obj")
    _sphere_obj(mesh_path, 160, 126)  # ~40k faces, the decimation target
    dcfg = RandomCameraConfig(
        eval_height=H, eval_width=H,
        n_test_views_horizontal=n_views, n_test_views_vertical=1,
    )
    ring = test_ring_cameras(dcfg)
    os.makedirs(os.path.join(tmp, "gs_rendered_rgba"))
    rng = np.random.RandomState(0)
    entries = []
    for i in range(n_views):
        gio.save_rgba_png(
            os.path.join(tmp, "gs_rendered_rgba", f"{i}.png"),
            rng.rand(H, H, 3).astype(np.float32),
            (rng.rand(H, H) > 0.3).astype(np.float32),
        )
        entries.append(ccam.camera_json_entry(
            i, ring["c2w"][i], float(ring["fovy"][i]), H, H))
    ccam.save_cameras_json(os.path.join(tmp, "cameras.json"), entries)
    return tmp, mesh_path


class _VaeOnlyStep:
    """train_step stub: texture grads flow render -> VAE encode (a unit
    cotangent into every latent), but the frozen-UNet CFG pair, the LoRA
    forward and the schedule math are gone."""

    def __init__(self, guidance):
        self._g = guidance

    def __call__(self, q_params, rgb01, text, pose16, rng, params=None):
        latents = self._g.encode_images(
            rgb01, rng, None if params is None else params["vae"]
        )
        loss = jnp.sum(latents * jax.lax.stop_gradient(jnp.ones_like(latents)))
        return loss, jax.lax.stop_gradient(latents)


class _RenderOnlyStep:
    """train_step stub: no VAE either; texture grads flow straight from a
    sum over the rendered image. Latents are placeholder zeros so the LoRA
    update (if enabled) still runs at full cost."""

    def __init__(self, latent_size=64):
        self._ls = latent_size

    def __call__(self, q_params, rgb01, text, pose16, rng, params=None):
        loss = jnp.sum(rgb01)
        return loss, jnp.zeros((rgb01.shape[0], self._ls, self._ls, 4),
                               rgb01.dtype)


def run_variant(name, tmp, mesh_path, vsd, text, q_params):
    from garmentdreamer_tpu.netf.trainer import NeTFConfig, NeTFTrainer

    kw = {}
    step_override = None
    vch = VCH
    if name.startswith("chunk"):
        # chunk-size sweep: per-chunk dispatch/marshalling overhead (the
        # ~1200-leaf frozen tree) shows up as ms/it varying with 1/chunk
        vch = int(name[len("chunk"):])
    elif name == "no_lora":
        kw["K2"] = 10**6
    elif name == "no_texapply":
        kw["batch_size_train"] = 10**6
    elif name == "vae_only":
        step_override = _VaeOnlyStep(vsd)
    elif name == "render_only":
        step_override = _RenderOnlyStep()
    elif name == "cover0":
        kw["vsd_cover_frac"] = 0.0
    elif name == "cover375":
        kw["vsd_cover_frac"] = 0.375
    elif name != "full":
        raise ValueError(name)

    if step_override is not None:
        orig = vsd.train_step
        vsd.train_step = step_override
    try:
        def run(iters):
            cfg = NeTFConfig(
                fit_tex_iters=0, iters=iters, vsd_scan_chunk=vch,
                reconstruction_picked_views=tuple(range(8)), **kw,
            )
            tr = NeTFTrainer(
                cfg, mesh_path, tmp, os.path.join(tmp, f"out_{name}"),
                guidance=vsd, text_embeddings=text, q_params=q_params,
            )
            t0 = time.perf_counter()
            tr.train_vsd()
            return time.perf_counter() - t0

        run(vch)  # compile + warm
        t_a, t_b = run(vch), run(3 * vch)
        ms = (t_b - t_a) / (2 * vch) * 1e3
        emit({"name": "vsd_knockout", "variant": name,
              "ms_per_iter": round(ms, 1)})
        return ms
    finally:
        if step_override is not None:
            vsd.train_step = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variants",
        default="full,no_lora,no_texapply,vae_only,render_only",
    )
    a = ap.parse_args()
    tmp, mesh_path = _sample_dir()
    vsd, text, q_params = _make_vsd_stack()
    base = None
    for v in a.variants.split(","):
        ms = run_variant(v, tmp, mesh_path, vsd, text, q_params)
        if v == "full":
            base = ms
        elif base is not None:
            emit({"name": "vsd_knockout_delta", "component": v,
                  "cost_ms_per_iter": round(base - ms, 1)})


if __name__ == "__main__":
    main()
