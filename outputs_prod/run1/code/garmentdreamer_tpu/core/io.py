"""Filesystem artifact I/O: OBJ meshes, 3DGS-format PLY point clouds, PNG images.

These formats are the stage-boundary contracts of the pipeline (SURVEY.md section 0):
``gs_rendered_rgba/{i}.png``, ``cameras.json``, ``last_3dgs.ply``,
``final_mesh.obj``. Writers are byte-layout compatible with the reference
(binary little-endian PLY with the exact 3DGS property list,
reference: gaussiansplatting/scene/gaussian_model.py:188-219; RGBA PNGs that decode
to the same pixels the reference's cv2 BGRA write produces).

No external geometry/vision deps: plyfile/trimesh/open3d/cv2 are replaced with
~200 lines of numpy + PIL.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

__all__ = [
    "save_gaussian_ply",
    "load_gaussian_ply",
    "save_color_ply",
    "load_obj",
    "save_obj",
    "save_rgba_png",
    "save_rgb_png",
    "load_rgba_png",
    "load_rgb_png",
]


# ---------------------------------------------------------------------------
# PLY (binary little endian)
# ---------------------------------------------------------------------------


def _ply_header(n: int, props: List[Tuple[str, str]]) -> bytes:
    lines = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    lines += [f"property {t} {name}" for name, t in props]
    lines += ["end_header", ""]
    return "\n".join(lines).encode("ascii")


_PLY_TYPES = {
    "float": "<f4",
    "float32": "<f4",
    "double": "<f8",
    "uchar": "u1",
    "uint8": "u1",
    "int": "<i4",
    "int32": "<i4",
    "ushort": "<u2",
    "short": "<i2",
    "char": "i1",
}


def save_gaussian_ply(
    path: str,
    xyz: np.ndarray,
    features_dc: np.ndarray,
    features_rest: np.ndarray,
    opacity: np.ndarray,
    scaling: np.ndarray,
    rotation: np.ndarray,
) -> None:
    """Write the 3DGS checkpoint PLY.

    Shapes follow the reference's parameter layout: ``features_dc`` (P,1,3),
    ``features_rest`` (P,M,3) with M = (deg+1)^2-1, ``opacity`` (P,1) (raw
    pre-sigmoid), ``scaling`` (P,3) (raw log), ``rotation`` (P,4) (raw quat).
    Property order matches gaussian_model.py:188-200 exactly: f_dc/f_rest are
    flattened channel-major (transpose(1,2).flatten), normals written as zeros.
    """
    xyz = np.asarray(xyz, np.float32)
    P = xyz.shape[0]
    f_dc = np.ascontiguousarray(
        np.transpose(np.asarray(features_dc, np.float32), (0, 2, 1))
    ).reshape(P, -1)
    f_rest = np.ascontiguousarray(
        np.transpose(np.asarray(features_rest, np.float32), (0, 2, 1))
    ).reshape(P, -1)
    opacity = np.asarray(opacity, np.float32).reshape(P, 1)
    scaling = np.asarray(scaling, np.float32).reshape(P, -1)
    rotation = np.asarray(rotation, np.float32).reshape(P, -1)

    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(f_dc.shape[1])]
    names += [f"f_rest_{i}" for i in range(f_rest.shape[1])]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(scaling.shape[1])]
    names += [f"rot_{i}" for i in range(rotation.shape[1])]

    data = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc, f_rest, opacity, scaling, rotation], axis=1
    ).astype("<f4")

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(_ply_header(P, [(n, "float") for n in names]))
        f.write(np.ascontiguousarray(data).tobytes())


def _read_ply(path: str) -> Dict[str, np.ndarray]:
    """Minimal PLY reader: single vertex element, binary LE or ascii."""
    with open(path, "rb") as f:
        raw = f.read()
    end = raw.find(b"end_header\n")
    if end < 0:
        raise ValueError(f"{path}: not a PLY file")
    header = raw[:end].decode("ascii", "replace").splitlines()
    body = raw[end + len(b"end_header\n") :]

    fmt = "binary_little_endian"
    n = 0
    props: List[Tuple[str, str]] = []
    in_vertex = False
    for line in header:
        tok = line.strip().split()
        if not tok:
            continue
        if tok[0] == "format":
            fmt = tok[1]
        elif tok[0] == "element":
            in_vertex = tok[1] == "vertex"
            if in_vertex:
                n = int(tok[2])
        elif tok[0] == "property" and in_vertex:
            if tok[1] == "list":
                raise ValueError("list properties unsupported in vertex element")
            props.append((tok[2], tok[1]))

    dtype = np.dtype([(name, _PLY_TYPES[t]) for name, t in props])
    if fmt == "binary_little_endian":
        arr = np.frombuffer(body, dtype=dtype, count=n)
    elif fmt == "ascii":
        arr = np.loadtxt(
            [l for l in body.decode().splitlines() if l.strip()][:n], dtype=np.float64
        ).astype(np.float32)
        arr = np.core.records.fromarrays(arr.T, dtype=dtype)
    else:
        raise ValueError(f"unsupported PLY format {fmt}")
    return {name: np.asarray(arr[name]) for name, _ in props}


def load_gaussian_ply(path: str, max_sh_degree: int = 0) -> Dict[str, np.ndarray]:
    """Load a 3DGS PLY back into raw parameter arrays
    (reference: gaussian_model.py:226-266)."""
    d = _read_ply(path)
    P = d["x"].shape[0]
    xyz = np.stack([d["x"], d["y"], d["z"]], axis=1).astype(np.float32)
    f_dc = np.stack([d["f_dc_0"], d["f_dc_1"], d["f_dc_2"]], axis=1).astype(np.float32)
    rest_names = sorted(
        (k for k in d if k.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    m = 3 * ((max_sh_degree + 1) ** 2 - 1)
    if len(rest_names) != m:
        raise ValueError(f"expected {m} f_rest fields for degree {max_sh_degree}, got {len(rest_names)}")
    if rest_names:
        f_rest = np.stack([d[k] for k in rest_names], axis=1).reshape(P, 3, -1)
        f_rest = np.transpose(f_rest, (0, 2, 1)).astype(np.float32)
    else:
        f_rest = np.zeros((P, 0, 3), np.float32)
    scale_names = sorted(
        (k for k in d if k.startswith("scale_")), key=lambda s: int(s.split("_")[-1])
    )
    rot_names = sorted(
        (k for k in d if re.fullmatch(r"rot_\d+", k)), key=lambda s: int(s.split("_")[-1])
    )
    return {
        "xyz": xyz,
        "features_dc": f_dc.reshape(P, 1, 3),
        "features_rest": f_rest,
        "opacity": d["opacity"].reshape(P, 1).astype(np.float32),
        "scaling": np.stack([d[k] for k in scale_names], axis=1).astype(np.float32),
        "rotation": np.stack([d[k] for k in rot_names], axis=1).astype(np.float32),
    }


def save_color_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Colored point cloud (float xyz + uchar rgb), the
    ``last_pointcloud_with_color.ply`` artifact."""
    xyz = np.asarray(xyz, np.float32)
    rgb8 = np.clip(np.asarray(rgb, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    n = xyz.shape[0]
    props = [("x", "float"), ("y", "float"), ("z", "float"), ("red", "uchar"), ("green", "uchar"), ("blue", "uchar")]
    rec = np.empty(n, dtype=np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("red", "u1"), ("green", "u1"), ("blue", "u1")]))
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["red"], rec["green"], rec["blue"] = rgb8[:, 0], rgb8[:, 1], rgb8[:, 2]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(_ply_header(n, props))
        f.write(rec.tobytes())


# ---------------------------------------------------------------------------
# OBJ
# ---------------------------------------------------------------------------


@dataclass
class ObjMesh:
    vertices: np.ndarray  # (V,3) float32
    faces: np.ndarray  # (F,3) int32, 0-based
    uvs: Optional[np.ndarray] = None  # (T,2)
    uv_faces: Optional[np.ndarray] = None  # (F,3) into uvs
    normals: Optional[np.ndarray] = None  # (N,3)
    normal_faces: Optional[np.ndarray] = None


def load_obj(path: str) -> ObjMesh:
    """Wavefront OBJ reader: v / vt / vn / f (triangulates polygons by fan)."""
    verts: List[List[float]] = []
    uvs: List[List[float]] = []
    normals: List[List[float]] = []
    faces: List[List[int]] = []
    uv_faces: List[List[int]] = []
    n_faces: List[List[int]] = []

    def parse_index(tok: str, length: int) -> Tuple[int, int, int]:
        parts = tok.split("/")
        vi = int(parts[0])
        ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
        ni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
        return vi, ti, ni

    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "v":
                verts.append([float(x) for x in tok[1:4]])
            elif tok[0] == "vt":
                uvs.append([float(x) for x in tok[1:3]])
            elif tok[0] == "vn":
                normals.append([float(x) for x in tok[1:4]])
            elif tok[0] == "f":
                idx = [parse_index(t, len(verts)) for t in tok[1:]]
                # fan triangulation for quads/ngons
                for k in range(1, len(idx) - 1):
                    tri = [idx[0], idx[k], idx[k + 1]]
                    faces.append([t[0] - 1 if t[0] > 0 else len(verts) + t[0] for t in tri])
                    if all(t[1] for t in tri):
                        uv_faces.append([t[1] - 1 for t in tri])
                    if all(t[2] for t in tri):
                        n_faces.append([t[2] - 1 for t in tri])

    return ObjMesh(
        vertices=np.asarray(verts, np.float32),
        faces=np.asarray(faces, np.int32).reshape(-1, 3),
        uvs=np.asarray(uvs, np.float32) if uvs else None,
        uv_faces=np.asarray(uv_faces, np.int32) if len(uv_faces) == len(faces) and uv_faces else None,
        normals=np.asarray(normals, np.float32) if normals else None,
        normal_faces=np.asarray(n_faces, np.int32) if len(n_faces) == len(faces) and n_faces else None,
    )


def save_obj(path: str, mesh: ObjMesh) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lines: List[str] = []
    for v in np.asarray(mesh.vertices, np.float32):
        lines.append(f"v {v[0]:.8f} {v[1]:.8f} {v[2]:.8f}")
    has_uv = mesh.uvs is not None and mesh.uv_faces is not None
    has_n = mesh.normals is not None and mesh.normal_faces is not None
    if has_uv:
        for t in mesh.uvs:
            lines.append(f"vt {t[0]:.8f} {t[1]:.8f}")
    if has_n:
        for nrm in mesh.normals:
            lines.append(f"vn {nrm[0]:.8f} {nrm[1]:.8f} {nrm[2]:.8f}")
    for i, face in enumerate(np.asarray(mesh.faces, np.int64)):
        if has_uv and has_n:
            tf, nf = mesh.uv_faces[i], mesh.normal_faces[i]
            lines.append(
                "f "
                + " ".join(f"{face[j]+1}/{tf[j]+1}/{nf[j]+1}" for j in range(3))
            )
        elif has_uv:
            tf = mesh.uv_faces[i]
            lines.append("f " + " ".join(f"{face[j]+1}/{tf[j]+1}" for j in range(3)))
        elif has_n:
            nf = mesh.normal_faces[i]
            lines.append("f " + " ".join(f"{face[j]+1}//{nf[j]+1}" for j in range(3)))
        else:
            lines.append(f"f {face[0]+1} {face[1]+1} {face[2]+1}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return np.clip(np.asarray(img, np.float32) * 255.0, 0, 255).astype(np.uint8)


def save_rgba_png(path: str, rgb: np.ndarray, alpha: np.ndarray) -> None:
    """Write the stage-1 artifact ``gs_rendered_rgba/{i}.png``: RGB in [0,1]
    (H,W,3) + binary/float alpha (H,W). Decodes to the same pixel values the
    reference's BGRA cv2 write produces (saving.py:301-356)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rgb8 = _to_uint8(rgb)
    a8 = _to_uint8(alpha)
    if a8.ndim == 3:
        a8 = a8[..., 0]
    rgba = np.dstack([rgb8, a8])
    Image.fromarray(rgba, "RGBA").save(path)


def save_rgb_png(path: str, rgb: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(_to_uint8(rgb), "RGB").save(path)


def load_rgba_png(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (rgb float32 [0,1] (H,W,3), alpha float32 [0,1] (H,W))."""
    img = np.asarray(Image.open(path).convert("RGBA"), np.float32) / 255.0
    return img[..., :3], img[..., 3]


def load_rgb_png(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
