"""Vanilla-3DGS scene loading: COLMAP and Blender (NeRF-synthetic) datasets.

Rebuild of the reference's standalone scene machinery (reference:
gaussiansplatting/scene/dataset_readers.py:26-260, colmap_loader.py:43-260,
scene/__init__.py:21-92) feeding :func:`splat.photometric.fit_photometric`:

* COLMAP: parse ``sparse/0/{images,cameras,points3D}.{bin,txt}`` (binary
  format per the COLMAP spec: little-endian packed structs), R =
  qvec2rotmat(qvec)^T, T = tvec, FoV from PINHOLE/SIMPLE_PINHOLE focals,
  every-``llffhold``-th view held out when ``eval`` (dataset_readers.py:
  68-105,132-178);
* Blender: ``transforms_{train,test}.json`` with the reference's axis dance
  (matrix = inv(transform), R = -matrix[:3,:3]^T with column 0 re-negated,
  T = -matrix[:3,3]) and white/black background compositing
  (dataset_readers.py:179-230); random init cloud when no points exist;
* nerf++ normalization (translate/radius from the camera-center bounding
  sphere, dataset_readers.py:45-66).

Output cameras use our column-vector GSCamera convention (core/cameras.py);
images come back as one (N, H, W, 3) float array ready for the jitted
photometric trainer.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from garmentdreamer_tpu.core import cameras as core_cam

__all__ = [
    "CameraInfo",
    "SceneInfo",
    "load_scene",
    "read_colmap_scene",
    "read_blender_scene",
    "qvec2rotmat",
    "gs_camera_from_rt",
    "camera_stack",
]


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) quaternion -> rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@dataclasses.dataclass
class CameraInfo:
    uid: int
    R: np.ndarray  # (3,3) c2w rotation (reference convention)
    T: np.ndarray  # (3,) w2c translation
    fovx: float
    fovy: float
    image: np.ndarray  # (H, W, 3) float [0,1]
    image_name: str
    width: int
    height: int


@dataclasses.dataclass
class SceneInfo:
    train_cameras: List[CameraInfo]
    test_cameras: List[CameraInfo]
    points: Optional[np.ndarray]  # (P, 3)
    colors: Optional[np.ndarray]  # (P, 3) in [0,1]
    translate: np.ndarray  # nerf++ normalization
    radius: float


# ---------------------------------------------------------------------------
# COLMAP binary/text parsers (format: colmap/src/base/reconstruction.cc)
# ---------------------------------------------------------------------------

_CAMERA_MODELS = {0: ("SIMPLE_PINHOLE", 3), 1: ("PINHOLE", 4)}


def _read_colmap_cameras_bin(path: str) -> Dict[int, Tuple[str, int, int, np.ndarray]]:
    out = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cam_id, model_id, w, h = struct.unpack("<iiQQ", f.read(24))
            if model_id not in _CAMERA_MODELS:
                raise ValueError(
                    f"unsupported COLMAP camera model id {model_id}; only "
                    "undistorted SIMPLE_PINHOLE/PINHOLE are handled "
                    "(dataset_readers.py:94 parity)"
                )
            name, n_params = _CAMERA_MODELS[model_id]
            params = np.array(struct.unpack(f"<{n_params}d", f.read(8 * n_params)))
            out[cam_id] = (name, int(w), int(h), params)
    return out


def _read_colmap_images_bin(path: str):
    out = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            img_id = struct.unpack("<I", f.read(4))[0]
            qvec = np.array(struct.unpack("<4d", f.read(32)))
            tvec = np.array(struct.unpack("<3d", f.read(24)))
            cam_id = struct.unpack("<I", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = struct.unpack("<Q", f.read(8))
            f.read(24 * n_pts)  # skip 2D points (x, y, point3D_id)
            out[img_id] = (qvec, tvec, cam_id, name.decode())
    return out


def _read_colmap_points_bin(path: str) -> Tuple[np.ndarray, np.ndarray]:
    xyzs, rgbs = [], []
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            f.read(8)  # point id
            xyzs.append(struct.unpack("<3d", f.read(24)))
            rgbs.append(struct.unpack("<3B", f.read(3)))
            f.read(8)  # reprojection error
            (track_len,) = struct.unpack("<Q", f.read(8))
            f.read(8 * track_len)
    return np.array(xyzs, np.float32), np.array(rgbs, np.float32) / 255.0


def _read_colmap_cameras_txt(path: str):
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            el = line.split()
            if el[1] not in ("SIMPLE_PINHOLE", "PINHOLE"):
                raise ValueError(f"unsupported COLMAP camera model {el[1]}")
            out[int(el[0])] = (
                el[1], int(el[2]), int(el[3]), np.array([float(x) for x in el[4:]])
            )
    return out


def _read_colmap_images_txt(path: str):
    out = {}
    with open(path) as f:
        lines = [l for l in f if not l.startswith("#")]
    # tolerant record iteration (COLMAP's own loader style): a record line
    # has >= 10 fields (ID QW..QZ TX..TZ CAM_ID NAME...); its 2D-points line
    # follows and is skipped -- but may be blank or absent on the final
    # record. NAME may contain spaces: join the tail fields.
    i = 0
    while i < len(lines):
        el = lines[i].split()
        i += 1
        if len(el) < 10:
            continue
        try:
            rec = (
                np.array([float(x) for x in el[1:5]]),
                np.array([float(x) for x in el[5:8]]),
                int(el[8]),
                " ".join(el[9:]),
            )
            out[int(el[0])] = rec
        except ValueError:
            continue
        i += 1  # skip the (possibly blank/absent) 2D-points line
    return out


def _read_colmap_points_txt(path: str):
    xyzs, rgbs = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            el = line.split()
            xyzs.append([float(x) for x in el[1:4]])
            rgbs.append([float(x) for x in el[4:7]])
    return np.array(xyzs, np.float32), np.array(rgbs, np.float32) / 255.0


def _nerfpp_norm(cams: List[CameraInfo]) -> Tuple[np.ndarray, float]:
    """Camera-center bounding sphere (dataset_readers.py:45-66)."""
    centers = []
    for c in cams:
        w2v = core_cam.gs_world_view(_c2w3dgs(c))
        centers.append(np.linalg.inv(w2v)[:3, 3])
    centers = np.stack(centers)
    avg = centers.mean(0)
    diag = np.linalg.norm(centers - avg, axis=1).max()
    radius = float(diag * 1.1)
    return -avg, radius


def _c2w3dgs(c: CameraInfo) -> np.ndarray:
    m = np.zeros((4, 4), np.float32)
    m[:3, :3] = c.R
    m[:3, 3] = c.T
    m[3, 3] = 1.0
    return m


def gs_camera_from_rt(
    R: np.ndarray, T: np.ndarray, fovx: float, fovy: float, height: int, width: int
) -> core_cam.GSCamera:
    """Splat camera from the reference's (R=c2w rotation, T=w2c translation)
    pair with independent FoVs (scene/cameras.py Camera semantics)."""
    w2v = core_cam.gs_world_view(
        np.block([[R, T.reshape(3, 1)], [np.zeros((1, 3)), np.ones((1, 1))]])
    )
    proj = core_cam.gs_projection(0.01, 100.0, fovx, fovy)
    full = (proj @ w2v).astype(np.float32)
    return core_cam.GSCamera(
        world_view=w2v.astype(np.float32),
        full_proj=full,
        camera_center=np.linalg.inv(w2v)[:3, 3].astype(np.float32),
        tanfovx=math.tan(fovx * 0.5),
        tanfovy=math.tan(fovy * 0.5),
        height=int(height),
        width=int(width),
    )


def camera_stack(cams: List[CameraInfo]) -> Dict[str, np.ndarray]:
    """CameraInfos -> stacked arrays for render_batch/fit_photometric."""
    gs = [
        gs_camera_from_rt(c.R, c.T, c.fovx, c.fovy, c.height, c.width) for c in cams
    ]
    return {
        "world_view": np.stack([g.world_view for g in gs]),
        "full_proj": np.stack([g.full_proj for g in gs]),
        "camera_center": np.stack([g.camera_center for g in gs]),
        "tanfov": np.stack(
            [np.array([g.tanfovx, g.tanfovy], np.float32) for g in gs]
        ),
    }


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def read_colmap_scene(
    path: str, images: Optional[str] = None, eval: bool = False, llffhold: int = 8
) -> SceneInfo:
    sp = os.path.join(path, "sparse", "0")
    if os.path.exists(os.path.join(sp, "images.bin")):
        extr = _read_colmap_images_bin(os.path.join(sp, "images.bin"))
        intr = _read_colmap_cameras_bin(os.path.join(sp, "cameras.bin"))
    else:
        extr = _read_colmap_images_txt(os.path.join(sp, "images.txt"))
        intr = _read_colmap_cameras_txt(os.path.join(sp, "cameras.txt"))

    img_dir = os.path.join(path, images or "images")
    infos = []
    for img_id, (qvec, tvec, cam_id, name) in extr.items():
        model, w, h, params = intr[cam_id]
        R = qvec2rotmat(qvec).T
        if model == "SIMPLE_PINHOLE":
            fx = fy = params[0]
        else:
            fx, fy = params[0], params[1]
        infos.append(
            CameraInfo(
                uid=cam_id, R=R, T=np.asarray(tvec, np.float32),
                fovx=core_cam.focal2fov(fx, w), fovy=core_cam.focal2fov(fy, h),
                image=_load_image(os.path.join(img_dir, os.path.basename(name))),
                image_name=os.path.splitext(os.path.basename(name))[0],
                width=w, height=h,
            )
        )
    infos.sort(key=lambda c: c.image_name)
    if eval:
        train = [c for i, c in enumerate(infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(infos) if i % llffhold == 0]
    else:
        train, test = infos, []

    pts = colors = None
    if os.path.exists(os.path.join(sp, "points3D.bin")):
        pts, colors = _read_colmap_points_bin(os.path.join(sp, "points3D.bin"))
    elif os.path.exists(os.path.join(sp, "points3D.txt")):
        pts, colors = _read_colmap_points_txt(os.path.join(sp, "points3D.txt"))

    translate, radius = _nerfpp_norm(train)
    return SceneInfo(train, test, pts, colors, translate, radius)


def _read_transforms(path: str, fname: str, white_background: bool, extension: str):
    with open(os.path.join(path, fname)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    infos = []
    for idx, frame in enumerate(contents["frames"]):
        img_path = os.path.join(path, frame["file_path"] + extension)
        from PIL import Image

        im = np.asarray(Image.open(img_path).convert("RGBA"), np.float32) / 255.0
        bg = np.ones(3) if white_background else np.zeros(3)
        rgb = im[..., :3] * im[..., 3:] + bg * (1.0 - im[..., 3:])

        # the reference's axis dance (dataset_readers.py:190-194)
        matrix = np.linalg.inv(np.array(frame["transform_matrix"]))
        R = -matrix[:3, :3].T
        R[:, 0] = -R[:, 0]
        T = -matrix[:3, 3]

        h, w = rgb.shape[:2]
        fovy = core_cam.focal2fov(core_cam.fov2focal(fovx, w), h)
        infos.append(
            CameraInfo(
                uid=idx, R=R, T=np.asarray(T, np.float32), fovx=fovx, fovy=fovy,
                image=rgb.astype(np.float32),
                image_name=os.path.splitext(os.path.basename(img_path))[0],
                width=w, height=h,
            )
        )
    return infos


def read_blender_scene(
    path: str, white_background: bool = False, eval: bool = False,
    extension: str = ".png", num_random_pts: int = 100_000, seed: int = 0,
) -> SceneInfo:
    train = _read_transforms(path, "transforms_train.json", white_background, extension)
    test = _read_transforms(path, "transforms_test.json", white_background, extension)
    if not eval:
        train = train + test
        test = []
    rs = np.random.RandomState(seed)
    pts = (rs.random_sample((num_random_pts, 3)) * 2.6 - 1.3).astype(np.float32)
    colors = rs.random_sample((num_random_pts, 3)).astype(np.float32)
    translate, radius = _nerfpp_norm(train)
    return SceneInfo(train, test, pts, colors, translate, radius)


def load_scene(path: str, **kw) -> SceneInfo:
    """Auto-detect COLMAP (sparse/) vs Blender (transforms_train.json)
    (scene/__init__.py:46-54)."""
    if os.path.exists(os.path.join(path, "sparse")):
        return read_colmap_scene(
            path, images=kw.get("images"), eval=kw.get("eval", False),
            llffhold=kw.get("llffhold", 8),
        )
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        return read_blender_scene(
            path, white_background=kw.get("white_background", False),
            eval=kw.get("eval", False), extension=kw.get("extension", ".png"),
        )
    raise ValueError(f"no COLMAP sparse/ or transforms_train.json under {path}")
