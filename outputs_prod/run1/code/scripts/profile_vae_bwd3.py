"""Composition experiment: full down0 block (2 resnets + downsample) at
512^2x128, plain vs remat-per-resnet vs resnet count scaling."""

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

from garmentdreamer_tpu.guidance.vae import VaeResnet


def _sync(x):
    return np.asarray(x)


def emit(name, ms, extra=None):
    rec = {"name": name, "ms": round(ms, 2)}
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
    emit(name, dt * 1e3, {"compile_s": round(compile_s, 1)})
    return dt


class Down0(nn.Module):
    n_res: int = 2
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        Res = nn.remat(VaeResnet) if self.remat else VaeResnet
        for j in range(self.n_res):
            x = Res(128, 32, jnp.bfloat16, name=f"r{j}")(x)
        return nn.Conv(128, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=jnp.bfloat16, name="ds")(x)


def probe(name, **kw):
    m = Down0(**kw)
    p = jax.eval_shape(lambda: m.init(jax.random.key(0), jnp.zeros((1, 512, 512, 128))))
    p = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), p)
    xs = [jax.random.normal(jax.random.key(i), (4, 512, 512, 128), jnp.bfloat16)
          for i in range(3)]

    def loss(pp, x):
        return jnp.sum(m.apply(pp, x).astype(jnp.float32) ** 2)

    g = jax.jit(lambda pp, x: jax.grad(loss, argnums=1)(pp, x).sum())
    f = jax.jit(loss)
    tf = time_loop(lambda x: f(p, x), [(x,) for x in xs], name=f"fwd_{name}")
    tg = time_loop(lambda x: g(p, x), [(x,) for x in xs], name=f"fwdbwd_{name}")
    emit(f"bwd_only_{name}", (tg - tf) * 1e3)


def main():
    probe("down0_plain", n_res=2, remat=False)
    probe("down0_remat", n_res=2, remat=True)
    probe("down0_1res", n_res=1, remat=False)


if __name__ == "__main__":
    main()
