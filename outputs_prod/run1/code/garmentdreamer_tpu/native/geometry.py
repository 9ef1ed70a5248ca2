"""ctypes binding for the native geometry kernels (src/geometry.cpp).

Builds the shared library on first use with g++ (cached in build/ keyed by a
source hash). API:

* ``decimate(verts, faces, target_faces)`` -> (verts, faces)
* ``remesh(verts, faces, target_edge_length, iters=5)`` -> (verts, faces)
* ``marching_cubes(grid, level)`` -> (verts (in index coords), faces)
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
from typing import Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "geometry.cpp")
_LIB = None


def _build() -> str:
    # the cache key covers source AND architecture: a build/ dir synced to a
    # different host must rebuild, not dlopen a foreign-arch .so
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read())
    h.update(platform.machine().encode())
    tag = h.hexdigest()[:16]
    build_dir = os.environ.get("GD_NATIVE_BUILD_DIR") or os.path.join(_DIR, "build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, f"libgdgeom_{tag}.so")
    if not os.path.exists(so):
        tmp = so + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so)
    return so


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        pd = ctypes.POINTER(ctypes.c_double)
        pi = ctypes.POINTER(ctypes.c_int32)
        ppd = ctypes.POINTER(pd)
        ppi = ctypes.POINTER(pi)
        pl = ctypes.POINTER(ctypes.c_int64)
        lib.gd_decimate.argtypes = [pd, ctypes.c_int64, pi, ctypes.c_int64,
                                    ctypes.c_int64, ppd, pl, ppi, pl]
        lib.gd_remesh.argtypes = [pd, ctypes.c_int64, pi, ctypes.c_int64,
                                  ctypes.c_double, ctypes.c_int32, ppd, pl, ppi, pl]
        lib.gd_marching_cubes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ppd, pl, ppi, pl,
        ]
        lib.gd_marching_cubes_udf.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ppd, pl, ppi, pl,
        ]
        lib.gd_closest_points.argtypes = [
            pd, ctypes.c_int64, pi, ctypes.c_int64, pd, ctypes.c_int64, pd, pd,
        ]
        lib.gd_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def _collect(lib, pv, nv, pf, nf) -> Tuple[np.ndarray, np.ndarray]:
    v = np.ctypeslib.as_array(pv, shape=(nv.value * 3,)).copy().reshape(-1, 3)
    f = (
        np.ctypeslib.as_array(pf, shape=(nf.value * 3,)).copy().reshape(-1, 3)
        if nf.value
        else np.zeros((0, 3), np.int32)
    )
    lib.gd_free(ctypes.cast(pv, ctypes.c_void_p))
    lib.gd_free(ctypes.cast(pf, ctypes.c_void_p))
    return v, f.astype(np.int32)


def decimate(verts: np.ndarray, faces: np.ndarray, target_faces: int):
    """Quadric-error decimation to <= target_faces (boundary-preserving)."""
    lib = _lib()
    v = np.ascontiguousarray(verts, np.float64)
    f = np.ascontiguousarray(faces, np.int32)
    pv = ctypes.POINTER(ctypes.c_double)()
    pf = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.gd_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        int(target_faces),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pf), ctypes.byref(nf),
    )
    if rc:
        raise RuntimeError(f"gd_decimate failed rc={rc}")
    return _collect(lib, pv, nv, pf, nf)


def remesh(verts: np.ndarray, faces: np.ndarray, target_edge_length: float,
           iters: int = 5):
    """Botsch-Kobbelt isotropic remeshing with projection to the input."""
    lib = _lib()
    v = np.ascontiguousarray(verts, np.float64)
    f = np.ascontiguousarray(faces, np.int32)
    pv = ctypes.POINTER(ctypes.c_double)()
    pf = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.gd_remesh(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        float(target_edge_length), int(iters),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pf), ctypes.byref(nf),
    )
    if rc:
        raise RuntimeError(f"gd_remesh failed rc={rc}")
    return _collect(lib, pv, nv, pf, nf)


def closest_points(verts: np.ndarray, faces: np.ndarray, queries: np.ndarray):
    """Distances + closest surface points of ``queries`` (N,3) against the
    mesh. Returns (dist (N,), cp (N,3))."""
    lib = _lib()
    v = np.ascontiguousarray(verts, np.float64)
    f = np.ascontiguousarray(faces, np.int32)
    q = np.ascontiguousarray(queries, np.float64)
    dist = np.empty(len(q), np.float64)
    cp = np.empty((len(q), 3), np.float64)
    rc = lib.gd_closest_points(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(f),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(q),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc:
        raise RuntimeError(f"gd_closest_points failed rc={rc}")
    return dist, cp


def marching_cubes_udf(udf: np.ndarray, grads: np.ndarray):
    """Isosurface of an UNSIGNED distance grid using per-block gradient
    pseudo-signs (meshudf role). ``grads`` is (nx,ny,nz,3) normalized
    negative-gradient field. Vertices in grid index coords."""
    lib = _lib()
    u = np.ascontiguousarray(udf, np.float32)
    g = np.ascontiguousarray(grads, np.float32)
    pv = ctypes.POINTER(ctypes.c_double)()
    pf = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.gd_marching_cubes_udf(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        u.shape[0], u.shape[1], u.shape[2],
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pf), ctypes.byref(nf),
    )
    if rc:
        raise RuntimeError(f"gd_marching_cubes_udf failed rc={rc}")
    return _collect(lib, pv, nv, pf, nf)


def marching_cubes(grid: np.ndarray, level: float):
    """Isosurface (marching tetrahedra) of a (nx,ny,nz) float32 scalar grid.
    Vertices are in grid index coordinates."""
    lib = _lib()
    g = np.ascontiguousarray(grid, np.float32)
    pv = ctypes.POINTER(ctypes.c_double)()
    pf = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.gd_marching_cubes(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g.shape[0], g.shape[1], g.shape[2], float(level),
        ctypes.byref(pv), ctypes.byref(nv), ctypes.byref(pf), ctypes.byref(nf),
    )
    if rc:
        raise RuntimeError(f"gd_marching_cubes failed rc={rc}")
    return _collect(lib, pv, nv, pf, nf)
