"""Dataset-scale autoencoder CLIs: preprocess / export codes / export meshes.

Rebuilds the reference's offline dataset scripts (reference:
AutoEncoder_dgcnn/encdec/preprocess_udf.py:1-52, export_codes.py:1-70,
export_meshes.py:1-247) on the JAX encoder/decoder:

* ``preprocess``: for every ``*.obj`` under ``meshes_dir``, sample a 100k
  surface point cloud + UDF query set (surface + noise-std shells, clamped to
  0.1 in the 2-cube) and write ``{stem}.npz`` with
  vertices/triangles/pcd/coords/labels/gradients -- the same archive fields;
  ``labels`` holds the BCE-ready ``1 - udf/max_dist`` in [0,1] that
  :class:`EncDecTrainer` consumes directly (the reference stores raw clamped
  udf and normalizes in the trainer, encdec.py:151-156).
* ``export-codes``: run the trained DGCNN encoder over every preprocessed
  ``.npz`` (or raw ``.obj``) and write ``{stem}_code.npy`` latents.
* ``export-meshes``: decode latent codes back to meshes through MeshUDF
  extraction, optionally rejecting bad reconstructions by chamfer distance
  (export_meshes.py:30-37 ``compute_chamfer_distance`` x100 convention).

Usage:
    python -m garmentdreamer_tpu.autoencoder.cli preprocess <meshes_dir> <out_dir>
    python -m garmentdreamer_tpu.autoencoder.cli export-codes <ckpt> <data_dir> <out_dir>
    python -m garmentdreamer_tpu.autoencoder.cli export-meshes <ckpt> <codes_dir> <out_dir>
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "preprocess_udf_dir",
    "export_codes_dir",
    "export_meshes_dir",
    "chamfer_distance",
    "save_encdec_ckpt",
    "load_encdec",
]


def chamfer_distance(
    v1: np.ndarray, f1: np.ndarray, v2: np.ndarray, f2: np.ndarray,
    num_points: int = 10000, seed: int = 0,
) -> float:
    """Symmetric point-sample chamfer x100 (export_meshes.py:30-37)."""
    from scipy.spatial import cKDTree

    from garmentdreamer_tpu.autoencoder.udf import sample_surface_points

    rs = np.random.RandomState(seed)
    p1 = sample_surface_points(v1, f1, num_points, rs)
    p2 = sample_surface_points(v2, f2, num_points, rs)
    d12, _ = cKDTree(p2).query(p1, k=1, workers=-1)
    d21, _ = cKDTree(p1).query(p2, k=1, workers=-1)
    return float((d12.mean() + d21.mean()) / 2.0 * 100.0)


def preprocess_udf_dir(
    meshes_dir: str,
    out_dir: str,
    num_points_pcd: int = 100_000,
    num_queries: int = 250_000,
    max_dist: float = 0.1,
    seed: int = 0,
) -> int:
    """-> number of meshes processed."""
    from garmentdreamer_tpu.autoencoder.udf import (
        make_udf_training_sample,
        sample_surface_points,
    )
    from garmentdreamer_tpu.core.io import load_obj

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for mesh_path in sorted(Path(meshes_dir).glob("*.obj")):
        obj = load_obj(str(mesh_path))
        v = np.asarray(obj.vertices, np.float32)
        f = np.asarray(obj.faces, np.int32)
        # normalize into the unit sphere (+eps), the reference's convention
        # (preprocess_udf.py comment block)
        center = (v.max(0) + v.min(0)) / 2
        v = v - center
        v = v / (np.linalg.norm(v, axis=1).max() + 1e-3)
        rs = np.random.RandomState(seed + n)
        pcd = sample_surface_points(v, f, num_points_pcd, rs)
        _, coords, labels, gradients = make_udf_training_sample(
            v, f,
            num_points_pcd=1,  # pcd sampled above at full size
            num_queries=num_queries,
            max_dist=max_dist,
            seed=seed + n,
        )
        np.savez(
            os.path.join(out_dir, f"{mesh_path.stem}.npz"),
            vertices=v, triangles=f, pcd=pcd,
            coords=coords, labels=labels, gradients=gradients,
        )
        n += 1
    return n


def save_encdec_ckpt(trainer, ckpt_dir: str, step: int = 0) -> None:
    import json

    from garmentdreamer_tpu.core.checkpoint import save_checkpoint

    os.makedirs(ckpt_dir, exist_ok=True)
    with open(os.path.join(ckpt_dir, "encdec_config.json"), "w") as f:
        json.dump(dataclasses.asdict(trainer.cfg), f)
    save_checkpoint(
        ckpt_dir, step,
        {"params": trainer.params, "batch_stats": trainer.batch_stats},
    )


def load_encdec(ckpt_dir: str):
    """ckpt dir (from save_encdec_ckpt) -> EncDecTrainer with restored weights."""
    import json

    from garmentdreamer_tpu.autoencoder.trainer import EncDecConfig, EncDecTrainer
    from garmentdreamer_tpu.core.checkpoint import (
        latest_step,
        restore_checkpoint,
    )

    step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    with open(os.path.join(ckpt_dir, "encdec_config.json")) as f:
        cfg = EncDecConfig(**json.load(f))
    trainer = EncDecTrainer(cfg)
    full = restore_checkpoint(
        ckpt_dir,
        {"params": trainer.params, "batch_stats": trainer.batch_stats},
        step=step,
    )
    trainer.params = full["params"]
    trainer.batch_stats = full["batch_stats"]
    return trainer


def export_codes_dir(ckpt_dir: str, data_dir: str, out_dir: str,
                     num_points_pcd: int = 10_000) -> int:
    """Encode every {stem}.npz (field 'pcd') or raw .obj -> {stem}_code.npy."""
    import jax.numpy as jnp

    from garmentdreamer_tpu.autoencoder.udf import sample_surface_points
    from garmentdreamer_tpu.core.io import load_obj

    trainer = load_encdec(ckpt_dir)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    paths = sorted(Path(data_dir).glob("*.npz")) + sorted(Path(data_dir).glob("*.obj"))
    for p in paths:
        if p.suffix == ".npz":
            pcd = np.load(p)["pcd"][:num_points_pcd]
        else:
            obj = load_obj(str(p))
            pcd = sample_surface_points(
                np.asarray(obj.vertices, np.float32),
                np.asarray(obj.faces, np.int32),
                num_points_pcd, np.random.RandomState(0),
            )
        code = np.asarray(trainer.encode(jnp.asarray(pcd[None])))[0]
        np.save(os.path.join(out_dir, f"{p.stem}_code.npy"), code)
        n += 1
    return n


def export_meshes_dir(
    ckpt_dir: str,
    codes_dir: str,
    out_dir: str,
    grid_n: int = 128,
    chamfer_threshold: Optional[float] = None,
    ref_meshes_dir: Optional[str] = None,
) -> int:
    """Decode {stem}_code.npy -> {stem}.obj via MeshUDF; with
    ``chamfer_threshold`` + ``ref_meshes_dir`` set, skip exports whose chamfer
    x100 vs the reference mesh exceeds the threshold (export_meshes.py's
    quality gate)."""
    import jax.numpy as jnp

    from garmentdreamer_tpu.autoencoder.udf import get_mesh_from_udf
    from garmentdreamer_tpu.core.io import ObjMesh, load_obj, save_obj

    trainer = load_encdec(ckpt_dir)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for p in sorted(Path(codes_dir).glob("*_code.npy")):
        code = jnp.asarray(np.load(p))
        fn = trainer.udf_fn(code)
        v, f = get_mesh_from_udf(fn, N=grid_n, max_dist=trainer.cfg.udf_max_dist)
        stem = p.stem[: -len("_code")]
        if chamfer_threshold is not None and ref_meshes_dir is not None:
            ref = Path(ref_meshes_dir) / f"{stem}.obj"
            if ref.exists() and len(f):
                r = load_obj(str(ref))
                cd = chamfer_distance(
                    v, f, np.asarray(r.vertices, np.float32),
                    np.asarray(r.faces, np.int32),
                )
                if cd > chamfer_threshold:
                    continue
        save_obj(os.path.join(out_dir, f"{stem}.obj"), ObjMesh(vertices=v, faces=f))
        n += 1
    return n


def main(argv=None):
    ap = argparse.ArgumentParser(prog="garmentdreamer_tpu.autoencoder.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("preprocess")
    p1.add_argument("meshes_dir")
    p1.add_argument("out_dir")
    p1.add_argument("--num-points-pcd", type=int, default=100_000)
    p1.add_argument("--num-queries", type=int, default=250_000)
    p2 = sub.add_parser("export-codes")
    p2.add_argument("ckpt")
    p2.add_argument("data_dir")
    p2.add_argument("out_dir")
    p3 = sub.add_parser("export-meshes")
    p3.add_argument("ckpt")
    p3.add_argument("codes_dir")
    p3.add_argument("out_dir")
    p3.add_argument("--grid-n", type=int, default=128)
    p3.add_argument("--chamfer-threshold", type=float, default=None)
    p3.add_argument("--ref-meshes-dir", default=None)
    a = ap.parse_args(argv)
    if a.cmd == "preprocess":
        n = preprocess_udf_dir(a.meshes_dir, a.out_dir, a.num_points_pcd, a.num_queries)
    elif a.cmd == "export-codes":
        n = export_codes_dir(a.ckpt, a.data_dir, a.out_dir)
    else:
        n = export_meshes_dir(
            a.ckpt, a.codes_dir, a.out_dir, a.grid_n,
            a.chamfer_threshold, a.ref_meshes_dir,
        )
    print(f"{a.cmd}: {n} items")


if __name__ == "__main__":
    main()
