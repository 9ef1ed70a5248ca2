"""Steady-state per-stage rates at PRODUCTION scale on one v5e chip:
stage-2 ViT-L normal estimation, stage-3 deformer iteration, stage-4 NeTF
iterations -- the numbers BENCH_E2E.md's v5e-8 projection needs beyond the
bench.py stage-1 metrics (VERDICT r2 next-1)."""

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


def emit(name, ms, extra=None):
    rec = {"name": name, "ms": round(ms, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def time_loop(fn, args_list, iters, warmup, name, per=1):
    t0 = time.perf_counter()
    for i in range(warmup):
        _sync(fn(*args_list[i % len(args_list)]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    _sync(out)
    dt = (time.perf_counter() - t0) / iters / per
    emit(name, dt * 1e3, {"compile_s": round(compile_s, 1)})
    return dt


def stage2_vitl():
    """407 forwards of ViT-L + RAFT @616x1064 (do_test.py:244)."""
    from garmentdreamer_tpu.normal.model import (
        NormalEstimator, NormalEstimatorConfig, init_params,
    )

    B = 2
    cfg = NormalEstimatorConfig.large(dtype=jnp.bfloat16)
    params = jax.eval_shape(lambda: init_params(cfg, jax.random.key(0)))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), params)
    model = NormalEstimator(cfg)
    fn = jax.jit(lambda p, x: model.apply(p, x)["normal"].sum())
    xs = [jax.random.uniform(jax.random.key(i), (B, 616, 1064, 3)) for i in range(3)]
    dt = time_loop(lambda x: fn(params, x), [(x,) for x in xs], 6, 2,
                   f"stage2_vitl_fwd_b{B}_616x1064", per=B)
    emit("stage2_407_views_projected_s", dt * 407 * 1e3)


def stage3_deformer():
    """Deformer iteration at 1024^2 / reference batch (deformation.py:143-216)."""
    import math

    from garmentdreamer_tpu.core.io import ObjMesh, save_obj

    # ~10k-vertex sphere template (production template scale)
    n_u, n_v = 120, 84
    vs, fs = [], []
    for i in range(n_u):
        for j in range(n_v):
            u = 2 * math.pi * i / n_u
            v = math.pi * (j + 0.5) / n_v
            vs.append((0.4 * math.sin(v) * math.cos(u), 0.6 * math.cos(v),
                       0.4 * math.sin(v) * math.sin(u)))
    for i in range(n_u):
        for j in range(n_v - 1):
            a = i * n_v + j
            b = ((i + 1) % n_u) * n_v + j
            fs.append((a, b, a + 1))
            fs.append((b, b + 1, a + 1))
    tpl = "/tmp/stage3_tpl.obj"
    save_obj(tpl, ObjMesh(vertices=np.array(vs, np.float32),
                          faces=np.array(fs, np.int32)))

    from garmentdreamer_tpu.deformer.driver import DeformerConfig, _build_stage1_step  # type: ignore

    try:
        from garmentdreamer_tpu.deformer import driver as drv
        has = hasattr(drv, "_build_stage1_step")
    except Exception:
        has = False
    if not has:
        emit("stage3_skip", 0.0, {"reason": "no isolated step builder"})
        return


def stage4_netf():
    pass


def main():
    stage2_vitl()


if __name__ == "__main__":
    main()
