"""End-to-end pipeline timing harness (BASELINE.json's 'end-to-end minutes
per garment' metric). Runs the FULL four-stage pipeline + prints one JSON
line per stage timing, plus the total.

Two scales:
* default: tiny configs (shape-checked pipeline; measures fixed costs +
  per-step rates at small shapes; completes in minutes on one chip);
* BENCH_E2E_STEPS=n overrides stage-1 SDS steps to extrapolate the 1200-step
  reference workload from the steady-state step rate.

Usage: python bench_e2e.py [workdir]
Output (stdout, last line): {"metric": "pipeline_e2e_seconds", ...}
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time


def _write_template(path: str):
    vs, fs = [], []
    n_u, n_v = 24, 16
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
    with open(path, "w") as f:
        for v in vs:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in fs:
            f.write(f"f {a+1} {b+1} {c+1}\n")


def main():
    # persistent compile cache: run this harness twice for cold vs warm
    # totals (VERDICT r2 next-2); GD_COMPILE_CACHE=off restores cold behavior
    from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default=None)
    a = ap.parse_args()
    workdir = a.workdir or tempfile.mkdtemp(prefix="bench_e2e_")
    os.makedirs(workdir, exist_ok=True)
    steps = int(os.environ.get("BENCH_E2E_STEPS", "6"))

    cfg_dir = os.path.join(workdir, "cfg")
    os.makedirs(cfg_dir, exist_ok=True)
    with open(os.path.join(cfg_dir, "gs.yaml"), "w") as f:
        f.write(
            f"""
data:
  batch_size: 2
  height: 128
  width: 128
  eval_height: 128
  eval_width: 128
  n_test_views_horizontal: 6
  n_test_views_vertical: 3
system:
  max_steps: {steps}
  num_surface_pts: 20000
  num_pts_space: 0
  capacity: 32768
  max_per_tile: 128
  max_tiles_per_gaussian: 8
  densify_from: 1000000
  densify_until: 0
"""
        )
    with open(os.path.join(cfg_dir, "deformer.yml"), "w") as f:
        f.write(
            """
iterations_first: 20
iterations_second: 10
upsample_iterations: []
picked_views_first: [0, 12]
picked_views_second: [0, 1, 2, 3]
save_frequency: 0
"""
        )
    with open(os.path.join(cfg_dir, "netf.yml"), "w") as f:
        f.write(
            """
enhance: true
iters: 4
fit_tex_iters: 10
render_resolution: 128
texture_resolution: 128
batch_size_train: 2
reconstruction_picked_views: [0, 1, 2, 3, 4, 5, 6, 7]
"""
        )

    tpl = os.path.join(workdir, "ellipsoid.obj")
    _write_template(tpl)

    from garmentdreamer_tpu.pipeline.launch import main as launch_main

    t0 = time.time()
    result = launch_main(
        [
            "--template_path", tpl,
            "--prompt", "a blue denim tee",
            "--output_folder", os.path.join(workdir, "out"),
            "--gs_config", os.path.join(cfg_dir, "gs.yaml"),
            "--deformer_config", os.path.join(cfg_dir, "deformer.yml"),
            "--netf_config", os.path.join(cfg_dir, "netf.yml"),
            "--model_scale", "tiny",
        ]
    )
    total = time.time() - t0
    for k, v in result["timings"].items():
        print(json.dumps({"metric": f"e2e_{k}", "value": round(v, 1), "unit": "s"}))
    print(
        json.dumps(
            {
                "metric": "pipeline_e2e_seconds",
                "value": round(total, 1),
                "unit": "s",
                "extra": {k: round(v, 1) for k, v in result["timings"].items()},
            }
        )
    )


if __name__ == "__main__":
    main()
