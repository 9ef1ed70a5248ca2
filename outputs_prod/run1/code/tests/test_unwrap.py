"""Chart-based UV unwrap (netf/unwrap.py): injectivity, coverage,
utilization vs the reference's xatlas role (mesh_renderer.py:261-313)."""

from __future__ import annotations

import numpy as np
import pytest


def sphere_mesh(nt: int, nz: int):
    t = np.linspace(0, 2 * np.pi, nt, endpoint=False)
    zz = np.linspace(-0.98, 0.98, nz)
    verts = []
    for z in zz:
        r = np.sqrt(max(1 - z * z, 1e-4))
        for a in t:
            verts.append((r * np.cos(a), r * np.sin(a), z))
    faces = []
    for i in range(nz - 1):
        for j in range(nt):
            a_, b_ = i * nt + j, i * nt + (j + 1) % nt
            c_, d_ = (i + 1) * nt + j, (i + 1) * nt + (j + 1) % nt
            faces.append((a_, b_, d_))
            faces.append((a_, d_, c_))
    return np.array(verts, np.float32), np.array(faces, np.int32)


def rasterize_counts(vt, ft, res):
    """Per-texel count of strictly-interior triangle coverage."""
    cnt = np.zeros((res, res), np.int16)
    uv_px = vt * res
    for i in range(ft.shape[0]):
        tri = uv_px[ft[i]]
        x0 = max(int(tri[:, 0].min()), 0)
        x1 = min(int(np.ceil(tri[:, 0].max())) + 1, res)
        y0 = max(int(tri[:, 1].min()), 0)
        y1 = min(int(np.ceil(tri[:, 1].max())) + 1, res)
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
        inside = (w0 >= 1e-4) & (w1 >= 1e-4) & (w2 >= 1e-4)
        yy, xx = np.nonzero(inside)
        cnt[yy + y0, xx + x0] += 1
    return cnt


class TestUnwrap:
    def test_small_sphere_injective_and_in_bounds(self):
        from garmentdreamer_tpu.netf.unwrap import unwrap_uv

        verts, faces = sphere_mesh(40, 26)  # 2000 faces
        vt, ft, stats = unwrap_uv(verts, faces, resolution=512)
        assert vt.shape == (faces.shape[0] * 3, 2)
        assert ft.shape == faces.shape
        assert vt.min() >= 0.0 and vt.max() <= 1.0 + 1e-5
        # every face kept a non-degenerate UV triangle
        a, b, c = vt[ft[:, 0]], vt[ft[:, 1]], vt[ft[:, 2]]
        area2 = np.abs(
            (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        )
        assert (area2 > 0).all(), "degenerate UV triangle"
        # injectivity: no texel strictly inside two different triangles
        cnt = rasterize_counts(vt, ft, 512)
        assert int((cnt > 1).sum()) == 0, f"{(cnt > 1).sum()} double-covered texels"

    @pytest.mark.slow
    def test_40k_sphere_utilization(self):
        """VERDICT r3 item 7: texel utilization on the production-size mesh.
        A sphere is the WORST case for chart packing (equal-size disk-like
        charts); garment panels flatten into larger, better-filling charts."""
        from garmentdreamer_tpu.netf.unwrap import unwrap_uv

        verts, faces = sphere_mesh(160, 126)  # 40k faces
        vt, ft, stats = unwrap_uv(verts, faces, resolution=1024)
        assert stats["utilization"] >= 0.70, stats
        cnt = rasterize_counts(vt, ft, 1024)
        assert int((cnt > 1).sum()) == 0
        # measured coverage agrees with the analytic utilization
        assert abs(cnt.astype(bool).mean() - stats["utilization"]) < 0.03


class TestDegenerateSingleFace:
    def test_sliver_face_gets_valid_uv(self):
        """A near-collinear sliver whose planar projection fails the fold
        check must still yield a positive-area UV triangle (ADVICE r4:
        previously the degenerate projection was kept verbatim)."""
        from garmentdreamer_tpu.netf.unwrap import unwrap_uv

        # one normal face + one exactly-degenerate face (collinear vertices:
        # zero world area, so the fold check's signed > 0.05*world fails)
        verts = np.array(
            [
                [0, 0, 0], [1, 0, 0], [0, 1, 0],   # face 0: fine
                [2, 0, 0], [3, 0, 0], [2.5, 0, 0],  # face 1: collinear
            ],
            np.float32,
        )
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        vt, ft, _ = unwrap_uv(verts, faces)
        uv = vt[ft]  # (F,3,2)
        e1 = uv[:, 1] - uv[:, 0]
        e2 = uv[:, 2] - uv[:, 0]
        area2 = np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        assert (area2 > 0).all(), area2

    def test_single_face_uv_right_triangle(self):
        from garmentdreamer_tpu.netf.unwrap import _single_face_uv

        verts = np.array([[0, 0, 0], [2, 0, 0], [0, 3, 0]], np.float64)
        faces = np.array([[0, 1, 2]], np.int32)
        uv = _single_face_uv(verts, faces, 0)
        assert uv.shape == (1, 3, 2)
        e1, e2 = uv[0, 1] - uv[0, 0], uv[0, 2] - uv[0, 0]
        area = 0.5 * abs(e1[0] * e2[1] - e1[1] * e2[0])
        assert area == pytest.approx(3.0)  # legs are the two longest edges
