"""Trace a short VSD-refinement scan at SD-2.1 scale and bucket device time
by op family (same json.gz recipe as profile_fit.py, which found the
space-to-batch regression). Attributes the ~1.5 s/it VSD step between the
textured render, the field-query VJP, the VAE encode, the three UNet
passes, and the LoRA update."""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402

N_IT = 5  # one scan chunk of 5: small trace, steady-state ops repeat 5x


def main():
    import tempfile

    from garmentdreamer_tpu.core import cameras as ccam, io as gio
    from garmentdreamer_tpu.data.cameras import RandomCameraConfig, test_ring_cameras
    from garmentdreamer_tpu.netf.trainer import NeTFConfig, NeTFTrainer
    from bench_stages import _make_vsd_stack, _sphere_obj  # same dir

    tmp = tempfile.mkdtemp(prefix="profile_vsd_")
    H = 1024
    mesh_path = os.path.join(tmp, "final_mesh.obj")
    _sphere_obj(mesh_path, 160, 126)
    n_views = 4
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

    vsd, text, q_params = _make_vsd_stack()
    cfg = NeTFConfig(fit_tex_iters=0, iters=N_IT, vsd_scan_chunk=N_IT,
                     reconstruction_picked_views=tuple(range(n_views)))

    # warm up the scan-N_IT compile outside the trace
    tr2 = NeTFTrainer(cfg, mesh_path, tmp, os.path.join(tmp, "out2"),
                      guidance=vsd, text_embeddings=text, q_params=q_params)
    tr2.train_vsd()

    tr = NeTFTrainer(cfg, mesh_path, tmp, os.path.join(tmp, "out"),
                     guidance=vsd, text_embeddings=text, q_params=q_params)
    trace_dir = os.path.join(tmp, "trace")
    with jax.profiler.trace(trace_dir):
        tr.train_vsd()

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace written under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pid_names.items() if "TPU" in n or "device" in n.lower()}
    fam = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue  # enclosing spans double-count
        dur = e.get("dur", 0) / 1e3  # ms
        total += dur
        key = name.split(".")[0].split("(")[0]
        key = key.rstrip("0123456789_")
        fam[key] += dur
    out = sorted(fam.items(), key=lambda kv: -kv[1])[:30]
    for k, v in out:
        print(json.dumps({"op": k, "ms_total": round(v, 1),
                          "ms_per_iter": round(v / N_IT, 1)}), flush=True)
    print(json.dumps({"op": "TOTAL", "ms_per_iter": round(total / N_IT, 1)}))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
