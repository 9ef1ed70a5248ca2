"""Bisect the VAE-encoder backward cost (fwd 81 ms, fwd+bwd 303 ms at
B=4@512^2): time grad-wrt-input through encoder PREFIXES to find which stage
owns the 222 ms backward."""

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

import flax.linen as nn

from garmentdreamer_tpu.guidance.vae import VAEConfig, VaeResnet, VaeSelfAttention


def _sync(x):
    return np.asarray(x)


def emit(name, ms, extra=None):
    rec = {"name": name, "ms": round(ms, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def time_loop(fn, args_list, iters=6, warmup=2, name="?"):
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
    emit(name, dt * 1e3, {"compile_s": round(compile_s, 1)})
    return dt


class Prefix(nn.Module):
    """Encoder prefix up to `upto` stages: conv_in=0, down0=1, down1=2,
    down2=3, down3=4, mid=5."""

    upto: int
    dt: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = VAEConfig.sd()
        ch = cfg.block_out_channels
        x = x.astype(self.dt)
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dt, name="conv_in")(x)
        if self.upto < 1:
            return x
        for i in range(min(self.upto, 4)):
            for j in range(cfg.layers_per_block):
                x = VaeResnet(ch[i], cfg.norm_groups, self.dt,
                              name=f"d{i}r{j}")(x)
            if i < 3:
                x = nn.Conv(ch[i], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dt,
                            name=f"d{i}s")(x)
        if self.upto >= 5:
            x = VaeResnet(ch[-1], cfg.norm_groups, self.dt, name="m0")(x)
            x = VaeSelfAttention(cfg.norm_groups, self.dt, name="ma")(x)
            x = VaeResnet(ch[-1], cfg.norm_groups, self.dt, name="m1")(x)
        return x


def main():
    B = 4
    xs = [jax.random.normal(jax.random.key(i), (B, 512, 512, 3)) for i in range(3)]
    for upto, tag in ((0, "conv_in"), (1, "down0_512sq"), (2, "+down1_256sq"),
                      (3, "+down2_128sq"), (4, "+down3_64sq"), (5, "+mid")):
        m = Prefix(upto=upto)
        p = jax.eval_shape(lambda m=m: m.init(jax.random.key(0), jnp.zeros((1, 512, 512, 3))))
        p = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), p)

        def loss(pp, x, m=m):
            return jnp.sum(m.apply(pp, x).astype(jnp.float32) ** 2)

        g = jax.jit(lambda pp, x: jax.grad(loss, argnums=1)(pp, x).sum())
        f = jax.jit(loss)
        t_f = time_loop(lambda x: f(p, x), [(x,) for x in xs], name=f"fwd_{tag}")
        t_g = time_loop(lambda x: g(p, x), [(x,) for x in xs], name=f"fwdbwd_{tag}")
        emit(f"bwd_only_{tag}", (t_g - t_f) * 1e3)


if __name__ == "__main__":
    main()
