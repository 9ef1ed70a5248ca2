"""Round-3 guidance profiling: flash-attention A/B on the SD-2.1 UNet and a
VAE-encoder backward breakdown. Run in background; poll the log."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(x):
    return np.asarray(x)


def emit(name, seconds, extra=None):
    rec = {"name": name, "ms": round(seconds * 1e3, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def time_loop(fn, args_list, iters=8, warmup=2, name="?"):
    t0 = time.perf_counter()
    for i in range(warmup):
        _sync(fn(*args_list[i % len(args_list)]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    emit(name, dt, {"compile_s": round(compile_s, 1)})
    return dt


def main():
    import dataclasses

    from garmentdreamer_tpu.guidance import (
        AutoencoderKL, UNet2DCondition, UNetConfig, VAEConfig,
    )

    B = 4
    lat_in = [jax.random.normal(jax.random.key(i), (2 * B, 64, 64, 4)) for i in range(3)]
    t_in = jnp.full((2 * B,), 500, jnp.int32)

    for flash in (False, True):
        ucfg = dataclasses.replace(
            UNetConfig.sd21(), dtype=jnp.bfloat16, flash_attention=flash
        )
        unet = UNet2DCondition(ucfg)
        k = jax.random.key(0)
        up = jax.eval_shape(
            lambda: unet.init(k, jnp.zeros((1, 64, 64, 4)), jnp.array([0]),
                              jnp.zeros((1, 77, ucfg.cross_attention_dim)))
        )
        up = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), up)
        txt = jnp.ones((2 * B, 77, ucfg.cross_attention_dim)) * 0.01
        fn = jax.jit(lambda p, l: unet.apply(p, l, t_in, txt).sum())
        time_loop(lambda l: fn(up, l), [(l,) for l in lat_in],
                  name=f"unet_fwd_b8_flash={flash}")
        if flash:
            # numerics: flash vs einsum on the same weights
            ucfg0 = dataclasses.replace(ucfg, flash_attention=False)
            unet0 = UNet2DCondition(ucfg0)
            o1 = unet.apply(up, lat_in[0], t_in, txt)
            o0 = unet0.apply(up, lat_in[0], t_in, txt)
            emit("flash_max_abs_diff", 0.0,
                 {"max_abs": float(jnp.abs(o1 - o0).max()),
                  "out_std": float(o0.std())})

    # ---- VAE encoder stage breakdown (fwd+bwd wrt input) ---------------
    vcfg = dataclasses.replace(VAEConfig.sd(), dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    k = jax.random.key(0)
    vp = jax.eval_shape(lambda: vae.init(k, jnp.zeros((1, 512, 512, 3)), k))
    vp = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), vp)
    imgs = [jax.random.normal(jax.random.key(10 + i), (B, 512, 512, 3)) for i in range(3)]

    def enc_loss(p, x, r):
        z = vae.apply(p, x, r, method=AutoencoderKL.sample_latents)
        return jnp.sum(z * z)

    g = jax.jit(lambda p, x: jax.grad(enc_loss, argnums=1)(p, x, jax.random.key(0)).sum())
    time_loop(lambda x: g(vp, x), [(x,) for x in imgs], name="vae_enc_fwdbwd_b4")

    f = jax.jit(lambda p, x: enc_loss(p, x, jax.random.key(0)))
    time_loop(lambda x: f(vp, x), [(x,) for x in imgs], name="vae_enc_fwd_b4")


if __name__ == "__main__":
    main()
