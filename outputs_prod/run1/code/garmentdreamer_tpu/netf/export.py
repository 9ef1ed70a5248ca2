"""Textured-mesh export: UV atlas, albedo bake from the texture field, OBJ +
MTL + PNG.

Reference flow (netf/render/mesh_renderer.py:260-313): xatlas UV unwrap
(kiui auto_uv), rasterize UVs at texture_resolution^2, query the texture field
at interpolated surface xyz in 640k batches, uv-pad, optional final x-flip
(reverse=True), write obj.

xatlas is not vendored in this image; the unwrap is the chart-based packer in
``netf/unwrap.py`` (normal-cone flood-fill charts, fold-checked planar
flattening, shelf packing) -- contiguous texel regions per chart, seams only
at chart boundaries, utilization comparable to xatlas. ``pack_uv_atlas``
(face-pair cells, ~50% utilization but unconditionally injective) remains as
the fallback for degenerate inputs.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["pack_uv_atlas", "bake_albedo", "write_textured_obj", "export_textured_mesh"]


def pack_uv_atlas(verts: np.ndarray, faces: np.ndarray, gutter: float = 0.15):
    """Assign each face a UV triangle in its own half of a square cell.

    Returns (vt (F*3, 2), ft (F, 3)): per-corner UVs, face -> vt indices.
    Faces are paired two-per-cell (lower-left / upper-right triangles with a
    gutter), cells arranged in a sqrt-grid.
    """
    F = faces.shape[0]
    n_cells = (F + 1) // 2
    grid = int(np.ceil(np.sqrt(n_cells)))
    cell = 1.0 / grid
    g = gutter * cell

    vt = np.zeros((F * 3, 2), np.float32)
    ft = np.arange(F * 3, dtype=np.int32).reshape(F, 3)
    for i in range(F):
        ci = i // 2
        cx, cy = (ci % grid) * cell, (ci // grid) * cell
        if i % 2 == 0:  # lower-left triangle
            tri = np.array(
                [[cx + g, cy + g], [cx + cell - g, cy + g], [cx + g, cy + cell - g]]
            )
        else:  # upper-right triangle
            tri = np.array(
                [
                    [cx + cell - g, cy + cell - g],
                    [cx + g, cy + cell - g],
                    [cx + cell - g, cy + g],
                ]
            )
        vt[3 * i : 3 * i + 3] = tri
    return vt, ft


def bake_albedo(
    query_fn,
    verts: np.ndarray,
    faces: np.ndarray,
    vt: np.ndarray,
    ft: np.ndarray,
    resolution: int = 1024,
    padding: int = 4,
    batch: int = 640000,
) -> np.ndarray:
    """Rasterize the UV layout on the host and query the texture field at the
    corresponding surface points (mesh_renderer.py:269-303).

    ``query_fn(xyz (N,3)) -> (N,3)`` albedo in [0,1].
    """
    H = W = resolution
    albedo = np.zeros((H, W, 3), np.float32)
    mask = np.zeros((H, W), bool)

    # host-side conservative UV rasterization per face
    uv_px = vt * resolution
    for i in range(faces.shape[0]):
        tri = uv_px[ft[i]]  # (3,2) in pixel units
        x0 = max(int(np.floor(tri[:, 0].min())), 0)
        x1 = min(int(np.ceil(tri[:, 0].max())) + 1, W)
        y0 = max(int(np.floor(tri[:, 1].min())), 0)
        y1 = min(int(np.ceil(tri[:, 1].max())) + 1, H)
        if x1 <= x0 or y1 <= y0:
            continue
        xs, ys = np.meshgrid(
            np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5, indexing="xy"
        )
        a, b, c = tri
        det = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(det) < 1e-12:
            continue
        w1 = ((xs - a[0]) * (c[1] - a[1]) - (ys - a[1]) * (c[0] - a[0])) / det
        w2 = ((b[0] - a[0]) * (ys - a[1]) - (b[1] - a[1]) * (xs - a[0])) / det
        w0 = 1.0 - w1 - w2
        inside = (w0 >= -1e-4) & (w1 >= -1e-4) & (w2 >= -1e-4)
        if not inside.any():
            continue
        p = (
            w0[..., None] * verts[faces[i, 0]]
            + w1[..., None] * verts[faces[i, 1]]
            + w2[..., None] * verts[faces[i, 2]]
        )
        yy, xx = np.nonzero(inside)
        # image row = v coordinate (origin at top for PNG; flip v)
        rows = H - 1 - (yy + y0)
        cols = xx + x0
        albedo[rows, cols] = 0.0  # filled below
        mask[rows, cols] = True
        # store positions temporarily in albedo (reuse buffer via dict too big)
        albedo[rows, cols] = p[yy, xx]

    # albedo currently holds xyz; query the field in batches
    idx = np.nonzero(mask)
    xyz = albedo[idx]
    out = np.zeros_like(xyz)
    for s in range(0, xyz.shape[0], batch):
        out[s : s + batch] = np.asarray(query_fn(xyz[s : s + batch]))
    albedo[idx] = out

    # dilation padding (uv_padding role)
    for _ in range(padding):
        m = mask.copy()
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            shifted = np.roll(mask, (dy, dx), (0, 1))
            src = np.roll(albedo, (dy, dx), (0, 1))
            fill = shifted & ~m
            albedo[fill] = src[fill]
            m |= fill
        mask = m
    return np.clip(albedo, 0.0, 1.0)


def write_textured_obj(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    vt: np.ndarray,
    ft: np.ndarray,
    albedo: np.ndarray,
) -> None:
    """OBJ + MTL + albedo PNG (kiui Mesh.write role)."""
    from PIL import Image

    base = os.path.splitext(path)[0]
    name = os.path.basename(base)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray((albedo * 255).astype(np.uint8)).save(base + "_albedo.png")
    with open(base + ".mtl", "w") as f:
        f.write(f"newmtl defaultMat\nKd 1 1 1\nmap_Kd {name}_albedo.png\n")
    with open(path, "w") as f:
        f.write(f"mtllib {name}.mtl\nusemtl defaultMat\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in vt:
            f.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
        for i in range(faces.shape[0]):
            a = faces[i] + 1
            b = ft[i] + 1
            f.write(f"f {a[0]}/{b[0]} {a[1]}/{b[1]} {a[2]}/{b[2]}\n")


def export_textured_mesh(
    path: str,
    query_fn,
    verts: np.ndarray,
    faces: np.ndarray,
    texture_resolution: int = 1024,
    reverse: bool = False,
) -> str:
    """Full export (mesh_renderer.py:260-313): unwrap, bake, optional x-flip
    (reverse=True for the final output orientation), write."""
    try:
        from garmentdreamer_tpu.netf.unwrap import unwrap_uv

        vt, ft, stats = unwrap_uv(verts, faces, resolution=texture_resolution)
        print(
            f"[export] chart unwrap: {int(stats['n_charts'])} charts, "
            f"{stats['utilization'] * 100:.1f}% texel utilization", flush=True,
        )
    except Exception as e:  # pragma: no cover - degenerate-input fallback
        import warnings

        warnings.warn(f"chart unwrap failed ({e}); using face-pair atlas")
        vt, ft = pack_uv_atlas(verts, faces)
    albedo = bake_albedo(query_fn, verts, faces, vt, ft, texture_resolution)
    v_out = verts.copy()
    f_out = faces.copy()
    if reverse:
        v_out[:, 0] = -v_out[:, 0]
        # x-flip inverts orientation; flip winding to keep outward normals
        f_out = f_out[:, ::-1].copy()
        ft = ft[:, ::-1].copy()
    write_textured_obj(path, v_out, f_out, vt, ft, albedo)
    return path
