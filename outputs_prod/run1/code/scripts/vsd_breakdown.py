"""Component-ablation timing of the VSD refinement step (VERDICT r4 next-3).

The jax.profiler trace through the axon tunnel attributes nothing (one
anonymous 15.8 s device blob, round-4 profile_vsd.log), so this measures the
step's components as STANDALONE jitted scan programs at exactly the
production shapes (render 512^2 on the 40k-face mesh, latents 64^2, SD-2.1
UNet/VAE bf16-compute, LoRA rank 4):

  render_fwd      textured G-buffer render forward
  render_fwdbwd   + VJP to texture params (hash-grid scatter)
  vae_fwd         VAE encode 512^2 -> 64^2 latents
  vae_fwdbwd      + VJP to the input image (the SpecifyGradient pullback)
  unet_cfg_fwd    frozen UNet, batch 2 (CFG pair)
  lora_fwd        LoRA UNet, batch 1 (score eval inside train_step)
  lora_train      lora_loss grad wrt LoRA/camera params + Adam (the q update)

Components overlap imperfectly with the fused step (XLA cross-fusion is
lost), so the sum is an upper-bound sanity check against the measured
stage4_vsd_ms_per_iter_512, not an identity. One JSON line per component.

Reference hot loop being attributed: netf/trainer.py:158-262,
sd_vsd_utils.py:131-218.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_stages import _make_vsd_stack, _sphere_obj  # noqa: E402

N = 10  # scan length per component program


def emit(name, ms):
    print(json.dumps({"op": name, "ms_per_iter": round(ms, 1)}), flush=True)


def timed_scan(fn, carry, xs, label):
    """jit a lax.scan of ``fn`` over N steps; return ms/step (2nd call)."""

    @jax.jit
    def run(carry, xs):
        return jax.lax.scan(fn, carry, xs)

    out = run(carry, xs)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") and x.size < 10 else None,
        out[1],
    )
    np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    t0 = time.perf_counter()
    out = run(carry, xs)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    ms = (time.perf_counter() - t0) / N * 1e3
    emit(label, ms)
    return ms


def main():
    import tempfile

    from garmentdreamer_tpu.core import io as gio
    from garmentdreamer_tpu.netf.renderer import (
        TextureField, clean_mesh, render_textured,
    )
    from garmentdreamer_tpu.netf.cameras import orbit_pose, perspective
    from garmentdreamer_tpu.netf.trainer import NeTFConfig

    cfg = NeTFConfig()
    res = cfg.render_resolution  # 512
    tmp = tempfile.mkdtemp(prefix="vsd_breakdown_")
    mesh_path = os.path.join(tmp, "m.obj")
    _sphere_obj(mesh_path, 160, 126)  # ~40k faces (decimation contract)
    obj = gio.load_obj(mesh_path)
    v, f = clean_mesh(np.asarray(obj.vertices, np.float32),
                      np.asarray(obj.faces, np.int32))
    verts, faces = jnp.asarray(v), jnp.asarray(f)

    field = TextureField(jax.random.PRNGKey(0))
    tex_params = field.params
    proj = jnp.asarray(perspective(cfg.fovy))
    rs = np.random.RandomState(0)
    poses = jnp.asarray(np.stack([
        orbit_pose(rs.randint(-65, 35), rs.randint(-180, 180), cfg.radius)
        for _ in range(N)
    ]), jnp.float32)

    vsd, text, q_params = _make_vsd_stack()
    sd_p = {"unet": vsd.unet_params, "vae": vsd.vae_params}

    import flax.traverse_util as tu

    flat_q = tu.flatten_dict(q_params)
    train_p = {k: x for k, x in flat_q.items()
               if "lora_down" in k or "lora_up" in k or k[0] == "camera"}
    frozen_p = {k: x for k, x in flat_q.items() if k not in train_p}

    def merge(train, frozen):
        d = dict(frozen)
        d.update(train)
        return tu.unflatten_dict(d)

    # ---- render fwd ----
    def rf(carry, pose):
        out = render_textured(
            tex_params, verts, faces, pose, proj, res, res, field,
            max_tiles_per_tri=cfg.max_tiles_per_tri,
            max_per_tile=cfg.max_per_tile,
        )
        return carry + out["image"].mean(), ()

    timed_scan(rf, jnp.float32(0), poses, "render_fwd")

    # ---- render fwd+bwd (VJP to texture params) ----
    def rb(carry, pose):
        def loss(p):
            out = render_textured(
                p, verts, faces, pose, proj, res, res, field,
                max_tiles_per_tri=cfg.max_tiles_per_tri,
                max_per_tile=cfg.max_per_tile,
            )
            return out["image"].mean()

        g = jax.grad(loss)(tex_params)
        return carry + jax.tree_util.tree_leaves(g)[0].mean(), ()

    timed_scan(rb, jnp.float32(0), poses, "render_fwdbwd")

    imgs = jax.random.uniform(jax.random.key(1), (N, 1, res, res, 3))
    keys = jax.random.split(jax.random.key(2), N)

    # ---- VAE encode fwd ----
    def vf(carry, xs):
        img, k = xs
        lat = vsd.encode_images(img, k, sd_p["vae"])
        return carry + lat.mean(), ()

    timed_scan(vf, jnp.float32(0), (imgs, keys), "vae_fwd")

    # ---- VAE encode fwd + bwd to the image ----
    def vb(carry, xs):
        img, k = xs

        def loss(im):
            return vsd.encode_images(im, k, sd_p["vae"]).sum()

        g = jax.grad(loss)(img)
        return carry + g.mean(), ()

    timed_scan(vb, jnp.float32(0), (imgs, keys), "vae_fwdbwd")

    lats = jax.random.normal(jax.random.key(3), (N, 1, 64, 64, 4))
    ts = jax.random.randint(jax.random.key(4), (N, 1), 20, 980)

    # ---- frozen UNet CFG pair (batch 2) ----
    def uf(carry, xs):
        lat, t = xs
        lat2 = jnp.concatenate([lat, lat], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        eps = vsd.unet_apply(sd_p["unet"], lat2, t2, text)
        return carry + eps.mean(), ()

    timed_scan(uf, jnp.float32(0), (lats, ts), "unet_cfg_fwd")

    # ---- LoRA UNet forward (batch 1, the score eval) ----
    pose16 = poses.reshape(N, 1, 16)
    qp_full = merge(train_p, frozen_p)

    def lf(carry, xs):
        lat, t, p16 = xs
        cam = vsd.camera_emb_apply(qp_full["camera"], p16, "albedo")
        v_q = vsd.lora_apply(qp_full["lora"], lat, t, text[:1], cam)
        return carry + v_q.mean(), ()

    timed_scan(lf, jnp.float32(0), (lats, ts, pose16), "lora_fwd")

    # ---- LoRA train step (grad wrt small subset + Adam) ----
    import optax

    lora_opt = optax.adam(cfg.unet_lr)
    lstate = lora_opt.init(train_p)

    def lt(carry, xs):
        tr, st = carry
        lat, p16, k = xs

        def loss(t_):
            return vsd.lora_loss(merge(t_, frozen_p), lat, text[:1], p16,
                                 k, cfg.uncond_p)

        g = jax.grad(loss)(tr)
        up, st = lora_opt.update(g, st)
        return (optax.apply_updates(tr, up), st), ()

    timed_scan(lt, (train_p, lstate), (lats, pose16, keys), "lora_train")


if __name__ == "__main__":
    main()
