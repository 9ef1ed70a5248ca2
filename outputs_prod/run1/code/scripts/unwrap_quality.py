"""Bake-quality comparison: chart unwrap vs the round-3 face-pair cell atlas.

Bakes a KNOWN procedural albedo into a 1024^2 atlas through both unwraps
(netf/unwrap.py charts vs netf/export.py pack_uv_atlas), then scores each by
the PSNR of bilinearly-sampled texture color against the ground-truth field
at 500k uniform surface samples -- at full atlas resolution and after 2x/4x
box downsampling (the mip levels where per-face seams bleed; VERDICT r3
item 7 / reference xatlas path: netf/render/mesh_renderer.py:261-313).

Pure host/numpy -- no TPU. One JSON line per (mode, mip) cell.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmentdreamer_tpu.netf.export import bake_albedo, pack_uv_atlas  # noqa: E402
from garmentdreamer_tpu.netf.unwrap import unwrap_uv  # noqa: E402

RES = 1024
N_SAMPLES = 500_000


def gt_field(xyz: np.ndarray) -> np.ndarray:
    f = np.stack(
        [
            np.sin(6.0 * xyz[:, 0] + 2.0 * xyz[:, 2]),
            np.sin(5.0 * xyz[:, 1] - 3.0 * xyz[:, 0]),
            np.sin(4.0 * xyz[:, 2] + 4.0 * xyz[:, 1]),
        ],
        axis=-1,
    )
    return (0.5 + 0.45 * f).astype(np.float32)


def sphere(nu=160, nv=126):
    u = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    v = np.linspace(1e-3, np.pi - 1e-3, nv)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    verts = np.stack(
        [np.sin(vv) * np.cos(uu), np.cos(vv), np.sin(vv) * np.sin(uu)], -1
    ).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(nu):
        for j in range(nv - 1):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            faces.append([a, b, a + 1])
            faces.append([b, b + 1, a + 1])
    return verts, np.asarray(faces, np.int32)


def surface_samples(verts, faces, n, seed=0):
    rs = np.random.RandomState(seed)
    tri = verts[faces]  # (F,3,3)
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    fi = rs.choice(len(faces), n, p=area / area.sum())
    r1, r2 = rs.rand(n, 1), rs.rand(n, 1)
    s1 = np.sqrt(r1)
    w = np.concatenate([1 - s1, s1 * (1 - r2), s1 * r2], axis=1)  # (n,3)
    xyz = np.einsum("nk,nkd->nd", w, tri[fi])
    return fi, w, xyz


def bilinear(img: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """img (H,W,3) with texel (r,c) centered at (c+0.5, r+0.5); x,y in px."""
    H, W = img.shape[:2]
    fx = np.clip(x - 0.5, 0, W - 1)
    fy = np.clip(y - 0.5, 0, H - 1)
    x0, y0 = np.floor(fx).astype(int), np.floor(fy).astype(int)
    x1, y1 = np.minimum(x0 + 1, W - 1), np.minimum(y0 + 1, H - 1)
    ax, ay = (fx - x0)[:, None], (fy - y0)[:, None]
    return (
        img[y0, x0] * (1 - ax) * (1 - ay)
        + img[y0, x1] * ax * (1 - ay)
        + img[y1, x0] * (1 - ax) * ay
        + img[y1, x1] * ax * ay
    )


def box_down(img: np.ndarray, k: int) -> np.ndarray:
    H, W, C = img.shape
    return img.reshape(H // k, k, W // k, k, C).mean((1, 3))


def main():
    verts, faces = sphere()
    fi, w, xyz = surface_samples(verts, faces, N_SAMPLES)
    gt = gt_field(xyz)

    modes = {}
    vt, ft, stats = unwrap_uv(verts, faces, resolution=RES)
    modes["charts"] = (vt, ft, stats)
    vtc, ftc = pack_uv_atlas(verts, faces)
    modes["cells"] = (vtc, ftc, None)

    for mode, (vt, ft, stats) in modes.items():
        atlas = bake_albedo(gt_field, verts, faces, vt, ft, RES)
        # flip to v-up so texel (r,c) sits at uv pixel (c+0.5, r+0.5)
        atlas_up = atlas[::-1].copy()
        uv = np.einsum("nk,nkd->nd", w, vt[ft[fi]])  # (n,2) in [0,1]
        for k in (1, 2, 4):
            img = atlas_up if k == 1 else box_down(atlas_up, k)
            res = RES // k
            got = bilinear(img, uv[:, 0] * res, uv[:, 1] * res)
            mse = float(np.mean((got - gt) ** 2))
            rec = {
                "name": "unwrap_quality", "mode": mode, "mip_down": k,
                "psnr_db": round(10 * np.log10(1.0 / max(mse, 1e-12)), 2),
            }
            if stats is not None and k == 1:
                rec["n_charts"] = int(stats["n_charts"])
                rec["utilization"] = round(float(stats["utilization"]), 3)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
