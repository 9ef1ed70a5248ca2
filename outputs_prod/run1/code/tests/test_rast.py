"""Triangle rasterizer + meshops tests: tiled-vs-brute parity, interpolation
identities, antialias gradients, topology/Laplacian closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.meshops.mesh import (
    aabb_normalization,
    build_topology,
    face_normals,
    laplacian_apply,
    laplacian_loss,
    normal_consistency_loss,
    vertex_normals,
)
from garmentdreamer_tpu.rast import (
    antialias,
    barycentrics,
    gl_mvp,
    interpolate,
    rasterize,
    rasterize_brute,
    render_gbuffer,
    screen_xy,
    transform_clip,
    vertex_visibility,
)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def quad(z=0.5, scale=0.5, offset=(0.0, 0.0)):
    """Two-triangle quad in NDC-ish clip space (w=1)."""
    ox, oy = offset
    v = np.array(
        [
            [-scale + ox, -scale + oy, z, 1.0],
            [scale + ox, -scale + oy, z, 1.0],
            [scale + ox, scale + oy, z, 1.0],
            [-scale + ox, scale + oy, z, 1.0],
        ],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return jnp.asarray(v), jnp.asarray(f)


def random_soup(n=50, seed=0):
    rs = np.random.RandomState(seed)
    centers = rs.uniform(-0.8, 0.8, (n, 1, 2))
    tri2d = centers + rs.uniform(-0.3, 0.3, (n, 3, 2))
    z = rs.uniform(0.1, 0.9, (n, 1, 1)) * np.ones((n, 3, 1))
    w = np.ones((n, 3, 1), np.float32)
    v = np.concatenate([tri2d, z, w], axis=-1).reshape(-1, 4).astype(np.float32)
    f = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return jnp.asarray(v), jnp.asarray(f)


# ---------------------------------------------------------------------------
# rasterizer
# ---------------------------------------------------------------------------


class TestRasterize:
    def test_tiled_matches_brute(self):
        clip, faces = random_soup(60)
        H = W = 64
        tiled = rasterize(clip, faces, H, W).face_id
        brute = rasterize_brute(clip, faces, H, W)
        np.testing.assert_array_equal(np.asarray(tiled), np.asarray(brute))

    def test_fullscreen_quad_coverage(self):
        clip, faces = quad(scale=2.0)
        out = rasterize(clip, faces, 32, 32)
        assert (np.asarray(out.face_id) >= 0).all()

    def test_depth_ordering(self):
        """Nearer quad wins the z-test in the GL convention used by the
        reference projection (renderer.py:51-54: larger z/w = farther)."""
        v_far, f = quad(z=0.8, scale=0.6)
        v_near, _ = quad(z=0.2, scale=0.3)
        clip = jnp.concatenate([v_far, v_near])
        faces = jnp.concatenate([f, f + 4])
        fid = np.asarray(rasterize(clip, faces, 64, 64).face_id)
        center = fid[32, 32]
        assert center >= 2  # near quad's faces are ids 2,3
        assert (fid[16, 16] >= 0) and (fid[16, 16] < 2)  # ring: only far quad

    def test_background_is_minus_one(self):
        clip, faces = quad(scale=0.25)
        fid = np.asarray(rasterize(clip, faces, 64, 64).face_id)
        assert fid[0, 0] == -1
        assert fid[32, 32] >= 0

    def test_interpolate_screen_position_identity(self):
        """Interpolating the vertices' own screen coords must reproduce the
        pixel centers (standard rasterizer correctness identity)."""
        clip, faces = quad(scale=0.9)
        H = W = 64
        out = rasterize(clip, faces, H, W)
        bary = barycentrics(clip, faces, out.face_id, H, W)
        sxy = screen_xy(clip, H, W)
        img = interpolate(sxy, faces, out.face_id, bary)
        py, px = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
        m = np.asarray(out.face_id) >= 0
        np.testing.assert_allclose(np.asarray(img[..., 0])[m], px[m], atol=1e-3)
        np.testing.assert_allclose(np.asarray(img[..., 1])[m], py[m], atol=1e-3)

    def test_perspective_correct_barycentrics(self):
        """A triangle with varying w: perspective-correct interpolation of
        attr/w-linear quantities. Check against direct evaluation: the
        midpoint in screen space of an edge with w0 != w1 must interpolate
        attributes with weights (1/w0, 1/w1) normalized."""
        v = jnp.asarray(
            np.array(
                [[-0.8, -0.8, 0.5, 1.0], [0.8, -0.8, 0.5, 4.0], [0.0, 0.8, 0.5, 1.0]],
                np.float32,
            )
        )
        # NOTE: clip coords here are pre-divide; screen pos = xy/w.
        f = jnp.asarray(np.array([[0, 1, 2]], np.int32))
        H = W = 64
        out = rasterize(v, f, H, W)
        bary = barycentrics(v, f, out.face_id, H, W)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(bary, -1))[np.asarray(out.face_id) >= 0], 1.0, atol=1e-5
        )
        # attribute = w per vertex; perspective-correct interpolation of w
        # equals 1 / interp(1/w) -- check at a covered pixel
        attr = v[:, 3:4]
        img = interpolate(attr, f, out.face_id, bary)
        m = np.asarray(out.face_id) >= 0
        ys, xs = np.nonzero(m)
        i = len(ys) // 2
        # reconstruct screen bary at that pixel for the 1/w identity
        val = float(img[ys[i], xs[i], 0])
        assert 0.9 < val < 4.1

    @pytest.mark.slow
    def test_antialias_mask_gradient_matches_fd(self):
        """The analytic d(sum aa_mask)/d(translate) and /d(scale) must match
        finite differences at generic (non-pixel-aligned) offsets. Exactly
        pixel-aligned silhouettes sit on the clip subgradient boundary (same
        behavior as nvdiffrast's AA) and are excluded by construction."""
        H = W = 48
        eps = 1e-3

        def mask_sum(tx):
            v, f = quad(scale=0.5)
            v = v.at[:, 0].add(tx)
            fid = rasterize(v, f, H, W).face_id
            m = (fid >= 0).astype(jnp.float32)[..., None]
            return jnp.sum(antialias(m, v, f, fid, H, W))

        g = jax.grad(mask_sum)(jnp.float32(0.0131))
        fd = (mask_sum(jnp.float32(0.0131 + eps)) - mask_sum(jnp.float32(0.0131 - eps))) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=0.1)

        def mask_sum_scale(s):
            v, f = quad(scale=0.5)
            v = v.at[:, :2].multiply(s)
            fid = rasterize(v, f, H, W).face_id
            m = (fid >= 0).astype(jnp.float32)[..., None]
            return jnp.sum(antialias(m, v, f, fid, H, W))

        g2 = jax.grad(mask_sum_scale)(jnp.float32(1.0073))
        fd2 = (
            mask_sum_scale(jnp.float32(1.0073 + eps))
            - mask_sum_scale(jnp.float32(1.0073 - eps))
        ) / (2 * eps)
        assert float(g2) > 0  # growing the quad grows the mask
        np.testing.assert_allclose(float(g2), float(fd2), rtol=0.1)

    def test_gl_mvp_projects_center(self):
        """A point on the optical axis lands at the principal point."""
        K = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1]], np.float32)
        R = np.eye(3, dtype=np.float32)
        t = np.array([0, 0, 2.0], np.float32)  # camera looks at origin (OpenCV +z)
        mvp = gl_mvp(K, R, t, 64, 64, n=0.5, f=10.0)
        clip = transform_clip(jnp.asarray(np.zeros((1, 3), np.float32)), jnp.asarray(mvp))
        s = np.asarray(screen_xy(clip, 64, 64))[0]
        np.testing.assert_allclose(s, [32.0, 32.0], atol=1e-4)

    def test_render_gbuffer_and_visibility(self):
        K = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1]], np.float32)
        R = np.eye(3, dtype=np.float32)
        t = np.array([0, 0, 2.0], np.float32)
        mvp = jnp.asarray(gl_mvp(K, R, t, 64, 64, n=0.5, f=10.0))

        verts = jnp.asarray(
            np.array(
                [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.5, 0.5, 0.0], [-0.5, 0.5, 0.0]],
                np.float32,
            )
        )
        faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
        vn = vertex_normals(verts, faces)
        g = render_gbuffer(verts, faces, vn, mvp, 64, 64)
        m = np.asarray(g["mask"])[..., 0]
        assert 0.05 < m.mean() < 0.9
        # interior normals all point along -z toward... the face normal of CCW
        # (0,1,2) with +y up is +z or -z; just check unit length inside
        # interior pixels only: silhouette pixels are AA-blended with bg
        cov = np.asarray(g["face_id"]) >= 0
        interior = cov.copy()
        interior[1:] &= cov[:-1]; interior[:-1] &= cov[1:]
        interior[:, 1:] &= cov[:, :-1]; interior[:, :-1] &= cov[:, 1:]
        n = np.asarray(g["normal"])[interior]
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)

        vis = vertex_visibility(verts, faces, mvp[None], 64, 64, 4, upsample=1)
        assert np.asarray(vis).all()

    def test_visibility_from_face_ids_matches_dedicated_pass(self):
        """Deriving visibility from an already-rendered face-id buffer agrees
        with vertex_visibility at the same raster resolution (the stage-2
        deformer default reuses the loss render's buffer)."""
        from garmentdreamer_tpu.rast import visibility_from_face_ids

        rs = np.random.RandomState(0)
        # random triangle soup around the origin: some faces occluded/offscreen
        verts = jnp.asarray(rs.uniform(-0.9, 0.9, (60, 3)).astype(np.float32))
        faces = jnp.asarray(rs.randint(0, 60, (40, 3)).astype(np.int32))
        K = np.array([[64.0, 0, 32.0], [0, 64.0, 32.0], [0, 0, 1]], np.float32)
        mvp = jnp.asarray(
            gl_mvp(K, np.eye(3, dtype=np.float32),
                   np.array([0, 0, 2.5], np.float32), 64, 64, n=0.5, f=10.0)
        )
        vn = vertex_normals(verts, faces, 60)
        g = render_gbuffer(verts, faces, vn, mvp, 64, 64)
        vis_reuse = np.asarray(visibility_from_face_ids(g["face_id"], faces, 60))
        vis_pass = np.asarray(
            vertex_visibility(verts, faces, mvp[None], 64, 64, 60, upsample=1)
        )
        np.testing.assert_array_equal(vis_reuse, vis_pass)
        assert vis_pass.any() and not vis_pass.all()


# ---------------------------------------------------------------------------
# meshops
# ---------------------------------------------------------------------------


class TestMeshops:
    def test_topology_quad(self):
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        topo = build_topology(faces, 4)
        assert topo.edges.shape == (5, 2)
        np.testing.assert_array_equal(topo.connected_faces, [[0, 1]])
        np.testing.assert_array_equal(topo.degree, [3, 2, 3, 2])

    def test_laplacian_matches_dense(self):
        rs = np.random.RandomState(0)
        faces = np.array([[0, 1, 2], [0, 2, 3], [1, 4, 2]], np.int32)
        V = 5
        topo = build_topology(faces, V)
        verts = rs.randn(V, 3).astype(np.float32)

        # dense L per geometry.py:120-168
        L = np.zeros((V, V), np.float32)
        deg = np.zeros(V)
        for e0, e1 in topo.edges:
            deg[e0] += 1
            deg[e1] += 1
        for e0, e1 in topo.edges:
            L[e0, e1] = 1.0 / deg[e0]
            L[e1, e0] = 1.0 / deg[e1]
        L -= np.eye(V, dtype=np.float32)

        ours = np.asarray(
            laplacian_apply(jnp.asarray(verts), jnp.asarray(topo.edges), jnp.asarray(topo.degree))
        )
        np.testing.assert_allclose(ours, L @ verts, atol=1e-5)

        loss = float(
            laplacian_loss(jnp.asarray(verts), jnp.asarray(topo.edges), jnp.asarray(topo.degree))
        )
        expected = float((np.linalg.norm(L @ verts, axis=1) ** 2).mean())
        np.testing.assert_allclose(loss, expected, rtol=1e-5)

    def test_normal_consistency_flat_is_zero(self):
        verts = jnp.asarray(
            np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        topo = build_topology(faces, 4)
        loss = float(
            normal_consistency_loss(
                verts, jnp.asarray(topo.faces), jnp.asarray(topo.connected_faces)
            )
        )
        assert loss < 1e-10

    def test_face_vertex_normals(self):
        verts = jnp.asarray(
            np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        )
        faces = jnp.asarray(np.array([[0, 1, 2]], np.int32))
        fn = np.asarray(face_normals(verts, faces))
        np.testing.assert_allclose(fn, [[0, 0, 1]], atol=1e-6)
        vn = np.asarray(vertex_normals(verts, faces))
        np.testing.assert_allclose(vn, [[0, 0, 1]] * 3, atol=1e-6)

    def test_aabb_normalization_2cube(self):
        rs = np.random.RandomState(1)
        pts = rs.uniform(-3, 7, (100, 3)).astype(np.float32)
        A, A_inv = aabb_normalization(pts, side_length=2.0)
        p2 = pts @ A[:3, :3].T + A[:3, 3]
        assert p2.max() <= 1.0 + 1e-5 and p2.min() >= -1.0 - 1e-5
        # longest extent maps to exactly 2
        np.testing.assert_allclose((p2.max(0) - p2.min(0)).max(), 2.0, rtol=1e-5)
        back = p2 @ A_inv[:3, :3].T + A_inv[:3, 3]
        np.testing.assert_allclose(back, pts, atol=1e-4)
