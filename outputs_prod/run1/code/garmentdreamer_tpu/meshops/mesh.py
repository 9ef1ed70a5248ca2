"""Triangle-mesh state for the deformer: static topology precomputed host-side
(numpy, vectorized), per-step geometry math in JAX.

Replaces the reference ``deformer/core/mesh.py:3-95`` and
``deformer/utils/geometry.py:8-55,120-168`` with a TPU-first design:

* topology (edges, connected faces, Laplacian neighbor table) is computed ONCE
  per "topology epoch" (it only changes at remesh, deformation.py:273-295) as
  plain numpy -- the reference recomputes a python loop over edges
  (``find_connected_faces``, geometry.py:27-55) which is O(E) python; ours is
  vectorized sort+unique;
* the uniform Laplacian L@V (geometry.py:120-168: L[i,j]=1/deg(i) for edges,
  -1 diagonal) is applied matrix-free with ``jax.ops.segment_sum`` -- no sparse
  matrices, fixed shapes, fuses into the loss graph;
* face/vertex normals exactly mirror ``Mesh.compute_normals``
  (deformer/core/mesh.py:78-95): unnormalized face cross products accumulated
  per vertex then normalized.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MeshTopology",
    "build_topology",
    "face_normals",
    "vertex_normals",
    "laplacian_apply",
    "laplacian_loss",
    "normal_consistency_loss",
    "aabb_normalization",
]


@dataclasses.dataclass(frozen=True)
class MeshTopology:
    """Static (non-traced) connectivity for a fixed triangulation."""

    faces: np.ndarray  # (F, 3) int32
    edges: np.ndarray  # (E, 2) int32, unique, sorted pairs
    connected_faces: np.ndarray  # (M, 2) int32 face ids sharing a manifold edge
    degree: np.ndarray  # (V,) float32 vertex degree in the edge graph
    num_vertices: int

    @property
    def num_faces(self) -> int:
        return int(self.faces.shape[0])


def build_topology(faces: np.ndarray, num_vertices: int) -> MeshTopology:
    """Vectorized equivalent of find_edges + find_connected_faces +
    degree computation (geometry.py:8-55)."""
    faces = np.asarray(faces, np.int32)
    F = faces.shape[0]
    # all 3F directed edges, sorted within pair
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=1)
    e = e.reshape(F * 3, 2)
    e_sorted = np.sort(e, axis=1)
    # face id owning each edge slot: [f0,f0,f0, f1,f1,f1, ...] matches reshape order
    face_ids = np.repeat(np.arange(F, dtype=np.int64), 3)

    uniq, inverse, counts = np.unique(
        e_sorted, axis=0, return_inverse=True, return_counts=True
    )
    if counts.max(initial=0) > 2:
        raise ValueError("non-manifold edge (shared by >2 faces)")

    # connected faces: for manifold interior edges, the two owning face ids.
    order = np.argsort(inverse, kind="stable")
    inv_sorted = inverse[order]
    fid_sorted = face_ids[order]
    # positions where each unique edge's run starts
    starts = np.searchsorted(inv_sorted, np.arange(uniq.shape[0]))
    interior = counts == 2
    first = fid_sorted[starts[interior]]
    second = fid_sorted[starts[interior] + 1]
    connected = np.stack([first, second], axis=1).astype(np.int32)

    deg = np.zeros(num_vertices, np.float32)
    np.add.at(deg, uniq[:, 0], 1.0)
    np.add.at(deg, uniq[:, 1], 1.0)

    return MeshTopology(
        faces=faces,
        edges=uniq.astype(np.int32),
        connected_faces=connected,
        degree=deg,
        num_vertices=int(num_vertices),
    )


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unit face normals (mesh.py:80-84)."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    n = jnp.cross(b - a, c - a)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-20)


def vertex_normals(
    verts: jnp.ndarray, faces: jnp.ndarray, num_vertices: Optional[int] = None
) -> jnp.ndarray:
    """Area-independent vertex normals: sum of unit face normals per incident
    vertex, renormalized (mesh.py:86-95)."""
    fn = face_normals(verts, faces)
    V = num_vertices or verts.shape[0]
    vn = jnp.zeros((V, 3), fn.dtype)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-20)


def laplacian_apply(
    verts: jnp.ndarray, edges: jnp.ndarray, degree: jnp.ndarray
) -> jnp.ndarray:
    """Matrix-free L @ V for the uniform Laplacian of geometry.py:120-168:
    (L@V)[i] = mean of neighbors - V[i]."""
    V = verts.shape[0]
    e0, e1 = edges[:, 0], edges[:, 1]
    acc = jnp.zeros_like(verts)
    acc = acc.at[e0].add(verts[e1])
    acc = acc.at[e1].add(verts[e0])
    inv_deg = jnp.where(degree > 0, 1.0 / degree, 0.0)[:, None]
    return acc * inv_deg - verts


def laplacian_loss(
    verts: jnp.ndarray, edges: jnp.ndarray, degree: jnp.ndarray
) -> jnp.ndarray:
    """Mean squared norm of differential coordinates
    (deformer/losses/laplacian.py:5-18)."""
    lv = laplacian_apply(verts, edges, degree)
    return jnp.mean(jnp.sum(lv * lv, axis=-1))


def normal_consistency_loss(
    verts: jnp.ndarray, faces: jnp.ndarray, connected_faces: jnp.ndarray
) -> jnp.ndarray:
    """Mean squared (1 - cos) between adjacent face normals
    (deformer/losses/normal_consistency.py:5-14)."""
    fn = face_normals(verts, faces)
    n0 = fn[connected_faces[:, 0]]
    n1 = fn[connected_faces[:, 1]]
    cos = jnp.sum(n0 * n1, axis=-1)
    return jnp.mean((1.0 - cos) ** 2)


def aabb_normalization(points: np.ndarray, side_length: float = 2.0):
    """Similarity transform A (and inverse) mapping the AABB of ``points`` to a
    cube of the given side length centered at the origin
    (geometry.py:100-118 ``normalize_aabb`` with SpaceNormalization's
    side_length=2, deformer/modules/space_normalization.py:8-27).

    Returns (A, A_inv) as (4,4) float32.
    """
    mn = points.min(axis=0)
    mx = points.max(axis=0)
    center = 0.5 * (mn + mx)
    s = side_length / float(np.max(mx - mn))
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] *= s
    A[:3, 3] = -s * center
    A_inv = np.eye(4, dtype=np.float32)
    A_inv[:3, :3] /= s
    A_inv[:3, 3] = center
    return A, A_inv
