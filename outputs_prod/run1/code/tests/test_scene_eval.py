"""Vanilla-3DGS data path: COLMAP/Blender loaders, LPIPS, eval harness
(reference: gaussiansplatting/scene/dataset_readers.py, colmap_loader.py,
metrics.py, lpipsPyTorch)."""

import json
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.splat.scene import (
    camera_stack,
    load_scene,
    qvec2rotmat,
    read_blender_scene,
    read_colmap_scene,
)


def _write_png(path, arr_u8):
    from PIL import Image

    Image.fromarray(arr_u8).save(path)


def _make_blender_scene(root, n_train=3, n_test=2, hw=16):
    rs = np.random.RandomState(0)
    for split, n in (("train", n_train), ("test", n_test)):
        frames = []
        for i in range(n):
            name = f"./{split}/r_{i}"
            os.makedirs(os.path.join(root, split), exist_ok=True)
            img = rs.randint(0, 255, (hw, hw, 4), np.uint8)
            img[..., 3] = (rs.rand(hw, hw) > 0.5).astype(np.uint8) * 255
            _write_png(os.path.join(root, split, f"r_{i}.png"), img)
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 3 + i]
            frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)


class TestBlender:
    def test_read_and_split(self, tmp_path):
        _make_blender_scene(str(tmp_path))
        sc = read_blender_scene(str(tmp_path), eval=True)
        assert len(sc.train_cameras) == 3 and len(sc.test_cameras) == 2
        sc2 = read_blender_scene(str(tmp_path), eval=False)
        assert len(sc2.train_cameras) == 5 and not sc2.test_cameras
        c = sc.train_cameras[0]
        assert c.image.shape == (16, 16, 3) and 0 <= c.image.min()
        # fovy = focal2fov(fov2focal(fovx, W), H); square image -> equal
        assert abs(c.fovx - 0.7) < 1e-6 and abs(c.fovy - 0.7) < 1e-6
        assert sc.points.shape[0] == 100_000
        assert sc.radius > 0

    def test_white_background_compositing(self, tmp_path):
        _make_blender_scene(str(tmp_path), n_train=1, n_test=1)
        w = read_blender_scene(str(tmp_path), white_background=True)
        b = read_blender_scene(str(tmp_path), white_background=False)
        iw, ib = w.train_cameras[0].image, b.train_cameras[0].image
        # where alpha == 0 white bg gives 1.0, black gives 0.0
        assert iw.max() <= 1.0 and ib.min() >= 0.0
        assert not np.allclose(iw, ib)

    def test_autodetect(self, tmp_path):
        _make_blender_scene(str(tmp_path))
        sc = load_scene(str(tmp_path))
        assert len(sc.train_cameras) == 5


def _make_colmap_bin(root, n=4, hw=16):
    rs = np.random.RandomState(1)
    sp = os.path.join(root, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    f_px = 20.0
    with open(os.path.join(sp, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, hw, hw))  # PINHOLE
        f.write(struct.pack("<4d", f_px, f_px, hw / 2, hw / 2))
    with open(os.path.join(sp, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            q = np.array([1.0, 0, 0, 0])
            t = np.array([0.0, 0, 2 + i])
            f.write(struct.pack("<I", i + 1))
            f.write(struct.pack("<4d", *q))
            f.write(struct.pack("<3d", *t))
            f.write(struct.pack("<I", 1))
            f.write(f"img_{i}.png\x00".encode())
            f.write(struct.pack("<Q", 0))
            _write_png(
                os.path.join(root, "images", f"img_{i}.png"),
                rs.randint(0, 255, (hw, hw, 3), np.uint8),
            )
    with open(os.path.join(sp, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 5))
        for i in range(5):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<3d", i * 0.1, 0, 0))
            f.write(struct.pack("<3B", 100, 150, 200))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 0, 0))


def _make_colmap_txt(root, n=4, hw=16):
    rs = np.random.RandomState(1)
    sp = os.path.join(root, "sparse", "0")
    os.makedirs(sp, exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    with open(os.path.join(sp, "cameras.txt"), "w") as f:
        f.write("# comment\n")
        f.write(f"1 PINHOLE {hw} {hw} 20.0 20.0 {hw/2} {hw/2}\n")
    with open(os.path.join(sp, "images.txt"), "w") as f:
        f.write("# comment\n")
        for i in range(n):
            f.write(f"{i+1} 1 0 0 0 0 0 {2+i} 1 img_{i}.png\n")
            f.write("\n")
            _write_png(
                os.path.join(root, "images", f"img_{i}.png"),
                rs.randint(0, 255, (hw, hw, 3), np.uint8),
            )
    with open(os.path.join(sp, "points3D.txt"), "w") as f:
        f.write("# comment\n")
        for i in range(5):
            f.write(f"{i} {i*0.1} 0 0 100 150 200 0.5 0 0\n")


class TestColmap:
    def test_binary_parse(self, tmp_path):
        _make_colmap_bin(str(tmp_path))
        sc = read_colmap_scene(str(tmp_path))
        assert len(sc.train_cameras) == 4
        assert sc.points.shape == (5, 3)
        np.testing.assert_allclose(sc.colors[0], [100 / 255, 150 / 255, 200 / 255])
        c = sc.train_cameras[0]
        # identity qvec -> R = I; focal 20 over 16 px
        np.testing.assert_allclose(c.R, np.eye(3), atol=1e-12)
        assert abs(c.fovx - 2 * np.arctan(16 / (2 * 20.0))) < 1e-6

    def test_text_matches_binary(self, tmp_path):
        b = tmp_path / "bin"
        t = tmp_path / "txt"
        b.mkdir(); t.mkdir()
        _make_colmap_bin(str(b))
        _make_colmap_txt(str(t))
        sb = read_colmap_scene(str(b))
        st = read_colmap_scene(str(t))
        for cb, ct in zip(sb.train_cameras, st.train_cameras):
            np.testing.assert_allclose(cb.R, ct.R, atol=1e-12)
            np.testing.assert_allclose(cb.T, ct.T, atol=1e-12)
            assert abs(cb.fovx - ct.fovx) < 1e-9
        np.testing.assert_allclose(sb.points, st.points)

    def test_eval_llffhold_split(self, tmp_path):
        _make_colmap_bin(str(tmp_path), n=8)
        sc = read_colmap_scene(str(tmp_path), eval=True, llffhold=4)
        assert len(sc.test_cameras) == 2 and len(sc.train_cameras) == 6

    def test_camera_stack_shapes(self, tmp_path):
        _make_colmap_bin(str(tmp_path))
        sc = read_colmap_scene(str(tmp_path))
        stack = camera_stack(sc.train_cameras)
        assert stack["world_view"].shape == (4, 4, 4)
        assert stack["tanfov"].shape == (4, 2)


class TestLPIPS:
    @pytest.mark.slow
    def test_identical_is_zero_and_differs_for_noise(self):
        from garmentdreamer_tpu.splat.lpips import LPIPS

        m = LPIPS()
        x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3), jnp.float32)
        p = m.init(jax.random.key(0), x, x)
        d_same = m.apply(p, x, x)
        assert float(d_same[0]) < 1e-6
        y = jnp.clip(x + 0.3, 0, 1)
        assert float(m.apply(p, x, y)[0]) > 0

    @pytest.mark.slow
    def test_converter_tree_matches_init(self):
        from garmentdreamer_tpu.splat.lpips import (
            LPIPS,
            _STAGES,
            convert_lpips_torch,
        )

        # synthesize a torch-layout state dict
        sd = {}
        li_per_slice = {1: [0, 2], 2: [0, 2], 3: [0, 2, 4], 4: [0, 2, 4], 5: [0, 2, 4]}
        in_ch = 3
        rs = np.random.RandomState(0)
        for si, (ch, _) in enumerate(_STAGES, start=1):
            for idx in li_per_slice[si]:
                sd[f"net.slice{si}.{idx}.weight"] = rs.randn(ch, in_ch, 3, 3).astype(np.float32)
                sd[f"net.slice{si}.{idx}.bias"] = rs.randn(ch).astype(np.float32)
                in_ch = ch
        for i, (ch, _) in enumerate(_STAGES):
            sd[f"lin{i}.model.1.weight"] = np.abs(rs.randn(1, ch, 1, 1)).astype(np.float32)

        params = convert_lpips_torch(sd)
        m = LPIPS()
        x = jnp.zeros((1, 32, 32, 3))
        ref = m.init(jax.random.key(0), x, x)
        ref_flat = jax.tree.structure(ref)
        got_flat = jax.tree.structure(params)
        assert ref_flat == got_flat
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(params)):
            assert a.shape == b.shape
        # converted params run
        d = m.apply(params, x, x)
        assert float(d[0]) < 1e-6


@pytest.mark.slow
class TestFullEval:
    def test_blender_scene_end_to_end(self, tmp_path):
        """train.py + render.py + metrics.py in one pass (full_eval.py)."""
        from garmentdreamer_tpu.splat.eval import full_eval
        from garmentdreamer_tpu.splat.photometric import PhotometricConfig

        _make_blender_scene(str(tmp_path), n_train=2, n_test=1, hw=16)
        sc = load_scene(str(tmp_path), eval=True)
        out = str(tmp_path / "out")
        m = full_eval(
            sc, out,
            fit_cfg=PhotometricConfig(
                iterations=3, batch_size=1, max_per_tile=64,
                max_tiles_per_gaussian=8,
            ),
        )
        assert np.isfinite(m["PSNR"]) and np.isfinite(m["SSIM"])
        assert os.path.isfile(os.path.join(out, "results.json"))
        assert os.path.isfile(os.path.join(out, "renders", "00000.png"))
        assert os.path.isfile(os.path.join(out, "gt", "00000.png"))

    def test_oversized_point_cloud_is_subsampled(self, tmp_path, capsys):
        """Real COLMAP captures can exceed the packed rasterizer's 2^19
        capacity; full_eval must clamp capacity, subsample the init cloud
        with a visible warning, and still complete (VERDICT r3 next-8,
        follows the ADVICE r2 capacity-clamp fix in splat/eval.py)."""
        from garmentdreamer_tpu.splat.eval import full_eval
        from garmentdreamer_tpu.splat.photometric import PhotometricConfig

        _make_blender_scene(str(tmp_path), n_train=1, n_test=1, hw=16)
        sc = load_scene(str(tmp_path), eval=True)
        rs = np.random.RandomState(0)
        n_big = (1 << 19) + 50_000
        sc = type(sc)(
            train_cameras=sc.train_cameras,
            test_cameras=sc.test_cameras,
            points=(rs.rand(n_big, 3).astype(np.float32) * 2 - 1),
            colors=np.full((n_big, 3), 0.5, np.float32),
            translate=sc.translate,
            radius=sc.radius,
        )
        out = str(tmp_path / "out_big")
        m = full_eval(
            sc, out,
            fit_cfg=PhotometricConfig(
                iterations=1, batch_size=1, max_per_tile=64,
                max_tiles_per_gaussian=4,
            ),
        )
        assert "subsampling" in capsys.readouterr().out
        assert np.isfinite(m["PSNR"])
        assert os.path.isfile(os.path.join(out, "results.json"))


class TestEvaluate:
    def test_psnr_ssim_lpips_dict(self, tmp_path):
        from garmentdreamer_tpu.splat.eval import evaluate
        from garmentdreamer_tpu.splat.lpips import LPIPS

        rs = np.random.RandomState(0)
        gts = rs.rand(2, 32, 32, 3).astype(np.float32)
        renders = np.clip(gts + rs.randn(*gts.shape).astype(np.float32) * 0.05, 0, 1)
        x = jnp.zeros((1, 32, 32, 3))
        lp = LPIPS().init(jax.random.key(0), x, x)
        out = evaluate(renders, gts, lpips_params=lp,
                       out_json=str(tmp_path / "results.json"))
        assert 15 < out["PSNR"] < 40 and 0 < out["SSIM"] <= 1
        assert out["LPIPS"] >= 0
        assert os.path.exists(tmp_path / "results.json")
