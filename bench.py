"""Benchmark: tile-binned splat render FPS @512^2 on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline proxy: the reference's CUDA diff-gaussian-rasterization forward renders
a ~100k-Gaussian scene at 512^2 at roughly 100 FPS on the reference's
single-GPU setup (BASELINE.md: the repo publishes no numbers; 100 FPS is the
commonly reported order for graphdeco 3DGS forward at this size and is the
fixed divisor used across rounds so the ratio is comparable round-to-round).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 100.0
N_GAUSS = 100_000
RES = 512
WARMUP = 3
ITERS = 20


def main():
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    for _ in range(WARMUP - 1):
        jax.block_until_ready(jfn(*args))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": f"splat_render_fps_{RES}x{RES}_{N_GAUSS // 1000}k",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
