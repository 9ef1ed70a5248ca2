"""Benchmark harness. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "extra": {...}}.

Headline metric (comparable round-to-round): tile-binned splat render FPS
@512^2 / 100k Gaussians on the attached accelerator, via the Pallas fast
forward path (rasterize_tiled_fast). Baseline proxy: the reference's CUDA
diff-gaussian-rasterization forward at this size on its single-GPU setup
(~100 FPS order; BASELINE.md -- the repo publishes no numbers, so 100 is the
fixed divisor across rounds).

``extra`` carries the BASELINE.json secondary metrics (splat train fwd+bwd
iters/s and stage-1 SDS iters/s at SD-2.1 scale) so every round records them
without changing the headline schema. The headline run ASSERTS n_dropped==0
at its capacity settings (VERDICT r1 weak-10).

Methodology (axon tunnel): ``block_until_ready`` does not reliably
synchronize through the remote TPU tunnel, so we force a device->host
transfer of a scalar after the timed loop, use DISTINCT cameras per iteration
(defeats value caching), and amortize the one sync over all iterations.

Set BENCH_SKIP_SDS=1 to skip the SDS-scale step (e.g. on hosts where the
SD-2.1-size UNet compile is unwanted).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 100.0
N_GAUSS = 100_000
RES = 512
WARMUP = 3
ITERS = 40

# -- transient-failure armor (VERDICT r3 missing-1) --------------------------
# Round 3's verified numbers were erased by ONE axon tunnel hiccup at the
# first device op ("Unable to initialize backend 'axon': UNAVAILABLE").
# The scoreboard must not be losable to a transient: backend acquisition is
# retried in-process with backoff, and if the process is wedged (the axon
# plugin caches a failed backend), the whole script re-execs itself for a
# fully fresh interpreter, up to BENCH_MAX_REEXECS times.
BACKEND_ATTEMPTS = 6
MAX_REEXECS = int(os.environ.get("BENCH_MAX_REEXECS", "3"))
_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "Unable to initialize backend",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
    "failed to connect",
    # NOTE: device OOM (RESOURCE_EXHAUSTED) is deterministic for a fixed
    # workload and deliberately NOT here -- retrying/re-exec'ing a genuine
    # OOM only delays the real error (ADVICE r4)
)


def _is_transient(e: BaseException) -> bool:
    msg = f"{type(e).__name__}: {e}"
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _reexec(reason: str):
    """Restart this script in a fresh interpreter (resets all JAX/plugin state)."""
    n = int(os.environ.get("BENCH_REEXEC_COUNT", "0"))
    if n >= MAX_REEXECS:
        return False
    os.environ["BENCH_REEXEC_COUNT"] = str(n + 1)
    print(
        f"[bench] re-exec {n + 1}/{MAX_REEXECS} after transient failure: "
        f"{reason[:200]}",
        flush=True,
    )
    time.sleep(10.0 * (n + 1))
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + sys.argv)
    return True  # unreachable


def _acquire_backend():
    """Bounded retry around backend init + the first device op."""
    import jax

    last: BaseException | None = None
    for attempt in range(BACKEND_ATTEMPTS):
        try:
            import jax.numpy as jnp

            np.asarray(jnp.arange(8) + 1)
            plat = jax.devices()[0].platform
            print(f"[bench] backend up: {plat} (attempt {attempt + 1})", flush=True)
            return
        except Exception as e:  # noqa: BLE001 - classified below
            last = e
            if not _is_transient(e):
                raise
            print(
                f"[bench] backend attempt {attempt + 1}/{BACKEND_ATTEMPTS} "
                f"failed: {type(e).__name__}: {e}"[:300],
                flush=True,
            )
            time.sleep(min(60.0, 5.0 * 2**attempt))
            try:  # drop any cached dead backend before retrying
                jax.clear_caches()
                jax.extend.backend.clear_backends()
            except Exception:
                pass
    assert last is not None
    if not _reexec(str(last)):
        raise last


def _sync(x):
    return np.asarray(x)


def _sync_tuple(xs):
    return tuple(np.asarray(x) for x in xs)


def _time_loop(fn, args_list, iters, warmup):
    for i in range(warmup):
        _sync(fn(*args_list[i % len(args_list)]))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    _sync(out)  # one real sync, amortized over iters
    return (time.perf_counter() - t0) / iters


def bench_splat_render(st, cams):
    """Headline: Pallas fast-path forward FPS @512^2/100k, n_dropped==0."""
    import jax
    import jax.numpy as jnp

    from garmentdreamer_tpu.splat.budgets import classes_for
    from garmentdreamer_tpu.splat.render import render_view

    bg = jnp.ones(3, jnp.float32)

    @jax.jit
    def fn(params, stats, cc):
        s = st.replace(params=params, stats=stats)
        out = render_view(
            s, cc, bg, RES, RES, max_per_tile=256,
            fast=True, payload_dtype="packed",
            classes=classes_for(RES, RES, st.capacity),
        )
        return out["render"].sum() + out["alpha"].sum(), out["n_dropped"]

    # validate capacity settings: no silently truncated instances (checked
    # over several cameras, not once)
    for i in range(4):
        n_dropped = int(_sync(fn(st.params, st.stats, cams[i])[1]))
        assert n_dropped == 0, (
            f"bench scene drops {n_dropped} instances at the configured "
            "class budgets; raise them"
        )

    # ON-CHIP packed-Pallas vs f32-XLA parity pin (VERDICT r2 next-4): the
    # two implementations are separate codebases (unlike the CUDA fwd/bwd
    # pair); every bench run asserts the Mosaic kernel's numerics against
    # the XLA tile path on the REAL chip before timing. The XLA path's
    # depth cap visibly truncates the full translucent 100k scene (that is
    # WHY the packed path window-chains), so the pin runs on a 20k
    # sub-scene where a K=2048 window is provably complete (asserted).
    # Budget: documented bf16 payload rounding (~1%).
    from __graft_entry__ import _make_scene

    def parity_at(n_pts, cap):
        st_p = _make_scene(n=n_pts, cap=cap)
        cls = classes_for(RES, RES, cap)

        @jax.jit
        def both(params, stats, cc):
            s = st_p.replace(params=params, stats=stats)
            pk = render_view(
                s, cc, bg, RES, RES, max_per_tile=256,
                fast=True, payload_dtype="packed", classes=cls,
            )
            xl = render_view(
                s, cc, bg, RES, RES,
                max_tiles_per_gaussian=cls[0][0], max_per_tile=4096,
                big_budget=cls[1][1], big_tiles=cls[1][0],
            )
            d_rgb = jnp.abs(pk["render"] - xl["render"]).max()
            d_a = jnp.abs(pk["alpha"] - xl["alpha"]).max()
            return d_rgb, d_a, xl["n_dropped"] + xl["n_harmful_px"] + pk["n_dropped"]

        return tuple(
            float(x) for x in _sync_tuple(both(st_p.params, st_p.stats, cams[0]))
        )

    # the XLA reference must be provably complete (its K-window canary silent)
    # for the comparison to be meaningful; translucent silhouette tiles run
    # deep, so back off the cloud size until the premise holds
    for n_pts, cap in ((5_000, 8_192), (2_000, 4_096), (500, 1_024)):
        d_rgb, d_a, nd_x = parity_at(n_pts, cap)
        if nd_x == 0:
            break
    assert nd_x == 0, f"parity premise broken even at 500 pts ({nd_x})"
    assert d_rgb < 2.5e-2 and d_a < 2.5e-2, (
        f"ON-CHIP packed/XLA parity failure: d_rgb={d_rgb:.4f} d_a={d_a:.4f} "
        f"@{n_pts} pts (bf16 budget 2.5e-2) -- Mosaic kernel numerics regressed"
    )
    print(
        f"[bench] on-chip packed/XLA parity @{n_pts} pts: "
        f"d_rgb={d_rgb:.4f} d_a={d_a:.4f}", flush=True,
    )

    args = [(st.params, st.stats, c) for c in cams]
    dt = _time_loop(lambda p, s, c: fn(p, s, c)[0], args, ITERS, WARMUP)
    return 1.0 / dt


def bench_splat_train(st, cams):
    """fwd+bwd through the production training pair: packed Pallas forward +
    Pallas gradient kernel (round 3; was the XLA-backward hybrid)."""
    import jax
    import jax.numpy as jnp

    from garmentdreamer_tpu.splat.budgets import classes_for
    from garmentdreamer_tpu.splat.render import render_view

    bg = jnp.ones(3, jnp.float32)

    @jax.jit
    def step(params, stats, cc):
        def loss_fn(p):
            s = st.replace(params=p, stats=stats)
            out = render_view(
                s, cc, bg, RES, RES, max_per_tile=256,
                fast=True, payload_dtype="packed", backward="pallas",
                classes=classes_for(RES, RES, st.capacity),
            )
            return out["render"].mean() + out["alpha"].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + sum(jnp.sum(g) for g in jax.tree.leaves(grads))

    args = [(st.params, st.stats, c) for c in cams]
    dt = _time_loop(step, args, 10, 2)
    return 1.0 / dt


def bench_sds_step(render_res: int = RES, n_iters: int = 8):
    """Stage-1 SDS train step at SD-2.1 scale (random weights, real shapes):
    B=4 views rendered @``render_res``^2 from a 100k cloud -> VAE encode
    (guidance downsamples to 512) -> UNet x2 (CFG) -> grads -> masked Adam.
    The BASELINE.json 'SDS iters/sec' metric. ``render_res=1024`` is the
    reference's actual training render size (gaussiandreamer-sd.yaml
    height/width 1024, VERDICT r4 weak-3); 512 is the documented fast
    profile."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_scene
    from garmentdreamer_tpu.data.cameras import RandomCameraConfig
    from garmentdreamer_tpu.guidance import (
        AutoencoderKL, PromptEmbeddings, SDSConfig, SDSGuidance,
        UNet2DCondition, UNetConfig, VAEConfig,
    )
    from garmentdreamer_tpu.systems.gaussiandreamer import (
        GaussianDreamerConfig, GaussianDreamerSystem,
    )

    import dataclasses

    # bf16 compute, f32 params: the production sd21 stack configuration
    # (pipeline/models.py; reference runs fp16-mixed)
    ucfg = dataclasses.replace(UNetConfig.sd21(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    vcfg = dataclasses.replace(VAEConfig(), dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    k = jax.random.key(0)
    up = jax.eval_shape(
        lambda: unet.init(k, jnp.zeros((1, 64, 64, 4)), jnp.array([0]),
                          jnp.zeros((1, 77, ucfg.cross_attention_dim)))
    )
    up = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), up)
    vp = jax.eval_shape(lambda: vae.init(k, jnp.zeros((1, 512, 512, 3)), k))
    vp = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), vp)

    guidance = SDSGuidance(
        SDSConfig(latent_size=64, image_size=512, guidance_scale=100.0),
        lambda p, l, t, c: unet.apply(p, l, t, c), up,
        lambda p, x, r: vae.apply(p, x, r, method=AutoencoderKL.sample_latents), vp,
    )
    emb = PromptEmbeddings(
        text_vd=jnp.ones((4, 77, ucfg.cross_attention_dim)) * 0.01,
        uncond_vd=jnp.zeros((4, 77, ucfg.cross_attention_dim)),
        text=jnp.ones((77, ucfg.cross_attention_dim)) * 0.01,
        uncond=jnp.zeros((77, ucfg.cross_attention_dim)),
    )
    # production rasterizer defaults (two-class expansion, mpt=512 window):
    # the SDS metric reflects the pipeline's real per-step configuration
    cfg = GaussianDreamerConfig(capacity=1 << 17, max_steps=1)
    data_cfg = RandomCameraConfig(
        height=render_res, width=render_res, batch_size=4
    )
    system = GaussianDreamerSystem(cfg, data_cfg, guidance, emb)

    st = _make_scene(n=N_GAUSS, cap=cfg.capacity)
    opt_state = system.init_optimizer(st)
    step_fn = system.train_step_fn(0, render_res, render_res)
    lambdas = {"sds": jnp.float32(1.0), "sparsity": jnp.float32(1.0),
               "opaque": jnp.float32(0.0)}

    batches = [system.sampler.sample() for _ in range(4)]

    g_params = system.guidance_params

    def run(bi, params, stats, opt):
        b = batches[bi]
        cams = {kk: jnp.asarray(v) for kk, v in b["gs_cameras"].items()}
        return step_fn(
            params, stats, opt, cams,
            jnp.asarray(b["elevation"]), jnp.asarray(b["azimuth"]),
            jax.random.key(bi), jnp.float32(2.0), lambdas, g_params,
        )

    # train_step donates params/stats/opt_state: thread them through
    params, stats, opt = st.params, st.stats, opt_state
    for i in range(2):  # compile + warmup
        params, stats, opt, aux = run(i % 4, params, stats, opt)
    _sync(aux["loss"])
    t0 = time.perf_counter()
    for i in range(n_iters):
        params, stats, opt, aux = run(i % 4, params, stats, opt)
    _sync(aux["loss"])
    dt = (time.perf_counter() - t0) / n_iters
    return 1.0 / dt


def main():
    from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    _acquire_backend()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_scene
    from garmentdreamer_tpu.core import cameras as cam

    st = _make_scene(n=N_GAUSS)
    cams = []
    for i in range(16):
        c = cam.gs_camera_from_spherical(
            15.0 + i, 30.0 + 11.0 * i, 3.5, float(np.deg2rad(70.0)), RES, RES
        )
        cams.append({k: jnp.asarray(v) for k, v in c.as_arrays().items()})

    fps = bench_splat_render(st, cams)
    extra = {"splat_train_iters_per_sec": round(bench_splat_train(st, cams), 2)}
    if not os.environ.get("BENCH_SKIP_SDS"):
        try:
            extra["sds_iters_per_sec_sd21_512"] = round(bench_sds_step(), 3)
            # the reference's true stage-1 training render size (1024^2,
            # guidance downsampling to 512 inside the step)
            extra["sds_iters_per_sec_sd21_1024"] = round(
                bench_sds_step(1024, n_iters=4), 3
            )
        except Exception as e:  # pragma: no cover - report, don't kill headline
            if _is_transient(e):
                raise  # escalate: top-level handler re-execs the whole run
            extra["sds_error"] = f"{type(e).__name__}: {e}"[:200]

    print(
        json.dumps(
            {
                "metric": f"splat_render_fps_{RES}x{RES}_{N_GAUSS // 1000}k",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 - transient tunnel failures re-exec
        if _is_transient(e) and _reexec(f"{type(e).__name__}: {e}"):
            pass  # unreachable (execv)
        else:
            raise
