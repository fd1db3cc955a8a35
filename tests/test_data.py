"""Tests for synthetic datagen + SAPIEN-layout loaders."""

import json
import os

import numpy as np
import pytest

from aonerf.data import SapienDataset, SapienMultiDataset, dataset_dict
from aonerf.data.camera import get_ray_directions_np, get_rays_np
from aonerf.data.synthetic import (
    generate_multi_scene,
    generate_single_scene,
    laptop_scene,
    render_scene,
)


@pytest.fixture(scope="module")
def single_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sapien_single"))
    generate_single_scene(root, img_wh=(64, 48), n_train=3, n_val=2, n_test=2)
    return root


@pytest.fixture(scope="module")
def multi_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sapien_multi"))
    generate_multi_scene(
        root, img_wh=(48, 36), n_instances=2, degrees=(0, 45, 90), n_images=2
    )
    return root


class TestCameraNp:
    def test_matches_jnp_ops(self):
        import jax.numpy as jnp
        from aonerf import ops

        h, w, f = 6, 8, 11.0
        d_np = get_ray_directions_np(h, w, f)
        d_j = np.asarray(ops.get_ray_directions(h, w, f))
        np.testing.assert_allclose(d_np, d_j, atol=1e-6)

        c2w = np.hstack([np.eye(3), [[0.5], [1.0], [4.0]]]).astype(np.float32)
        o_np, v_np, rd_np, r_np = get_rays_np(d_np, c2w)
        o_j, v_j, rd_j, r_j = ops.get_rays(jnp.asarray(d_np), jnp.asarray(c2w))
        np.testing.assert_allclose(o_np, np.asarray(o_j), atol=1e-6)
        np.testing.assert_allclose(v_np, np.asarray(v_j), atol=1e-6)
        np.testing.assert_allclose(r_np, np.asarray(r_j), atol=1e-6)


class TestSyntheticScene:
    def test_render_produces_object(self):
        from aonerf.data.camera import look_at_c2w

        boxes = laptop_scene(60.0)
        c2w = look_at_c2w(np.array([0, -3.5, 2.0]), np.zeros(3), np.array([0.0, 0, 1.0]))
        rgb, alpha, seg = render_scene(boxes, c2w, 48, 64, 40.0)
        assert rgb.shape == (48, 64, 3)
        assert 0.02 < alpha.mean() < 0.98  # object visible, not filling frame
        assert set(np.unique(seg)) <= {0, 1, 2}
        assert (seg == 2).sum() > 0  # lid visible at 60 deg

    def test_articulation_moves_lid(self):
        from aonerf.data.camera import look_at_c2w

        c2w = look_at_c2w(np.array([0, -3.5, 2.0]), np.zeros(3), np.array([0.0, 0, 1.0]))
        _, a0, _ = render_scene(laptop_scene(0.0), c2w, 48, 64, 40.0)
        _, a90, _ = render_scene(laptop_scene(90.0), c2w, 48, 64, 40.0)
        assert np.mean(a0 != a90) > 0.01  # silhouette changes with articulation

    def test_layout_single(self, single_root):
        assert os.path.isdir(os.path.join(single_root, "train", "rgb"))
        meta = json.load(open(os.path.join(single_root, "train", "transforms.json")))
        assert "focal" in meta and len(meta["frames"]) == 3
        c2w = np.asarray(meta["frames"]["r_0"])
        assert c2w.shape == (4, 4)

    def test_layout_multi(self, multi_root):
        base = os.path.join(multi_root, "10000", "train", "45_degree")
        assert os.path.isdir(os.path.join(base, "rgb"))
        assert os.path.isdir(os.path.join(base, "seg"))
        meta = json.load(open(os.path.join(base, "transforms.json")))
        assert "camera_angle_x" in meta


class TestSapienDataset:
    def test_registry(self):
        assert dataset_dict["sapien"] is SapienDataset
        assert dataset_dict["sapien_multi"] is SapienMultiDataset

    def test_train_buffers(self, single_root):
        ds = SapienDataset(single_root, split="train", img_wh=(64, 48), white_back=True)
        assert ds.num_rays == 3 * 64 * 48
        buf = ds.train_buffers()
        for k in ("rays_o", "rays_d", "viewdirs", "target"):
            assert buf[k].shape[0] == ds.num_rays
        np.testing.assert_allclose(
            np.linalg.norm(buf["rays_d"], axis=-1), 1.0, atol=1e-5
        )
        # white-blended targets: background pixels are exactly white
        assert (buf["target"].max() <= 1.0) and (buf["target"].min() >= 0.0)
        assert np.mean(np.all(buf["target"] > 0.999, axis=-1)) > 0.1

    def test_val_image(self, single_root):
        ds = SapienDataset(single_root, split="val", img_wh=(64, 48), white_back=True)
        sample = ds.get_image(0)
        assert sample.rays_o.shape == (64 * 48, 3)
        assert sample.target.shape == (64 * 48, 3)
        assert sample.instance_mask.dtype == bool
        assert 0 < sample.instance_mask.mean() < 1


class TestSapienMultiDataset:
    def test_train_sampling(self, multi_root):
        ds = SapienMultiDataset(
            multi_root, split="train", img_wh=(48, 36), white_back=True,
            ray_batch_size=256,
        )
        assert ds.n_instances == 2
        assert ds.n_articulations(0) == 3
        rng = np.random.default_rng(0)
        batch = ds.sample_train(rng)
        assert batch["rays_o"].shape == (256, 3)
        assert batch["target"].shape == (256, 3)
        assert batch["src_imgs"].shape == (3, 36, 48)
        assert batch["instance_id"] < 2 and batch["articulation_id"] < 3
        # deg consistent with articulation id
        deg = np.rad2deg(float(batch["deg"]))
        assert min(abs(deg - x) for x in (0.0, 45.0, 90.0)) < 1e-4
        # src image normalized to [-1, 1]
        assert batch["src_imgs"].min() >= -1.0 and batch["src_imgs"].max() <= 1.0

    def test_full_image_and_test_pose(self, multi_root):
        ds = SapienMultiDataset(
            multi_root, split="test", img_wh=(48, 36), white_back=True,
            eval_inference="x",
        )
        img = ds.get_image(0, 1, 0)
        assert img["rays_o"].shape == (48 * 36, 3)
        test = ds.get_test_image(0, 5)
        assert test["articulation_id"] == 5
        assert test["rays_o"].shape == (48 * 36, 3)
        assert ds.poses_test.shape == (40, 4, 4)


class TestPrefetcher:
    def test_produces_batches_and_propagates_errors(self):
        from aonerf.data.prefetch import Prefetcher

        counter = {"n": 0}

        def make():
            counter["n"] += 1
            return {"i": counter["n"]}

        pf = Prefetcher(make, depth=2)
        got = [pf.get() for _ in range(5)]
        assert all("i" in b for b in got)
        pf.close()

        def boom():
            raise RuntimeError("bad batch")

        pf2 = Prefetcher(boom)
        import pytest

        with pytest.raises(RuntimeError, match="bad batch"):
            pf2.get(timeout=5)
        pf2.close()


class TestNativeLoader:
    """The C++ loader must agree with the PIL/numpy path exactly (both
    decode the same PNG bytes; ray math agrees to float rounding)."""

    def test_decode_and_scene_parity(self, tmp_path):
        import aonerf.native as native

        if native.get_loader() is None:
            pytest.skip("no native toolchain")
        import numpy as np
        from PIL import Image as PILImage

        rng = np.random.default_rng(0)
        rgba = rng.integers(0, 256, (12, 16, 4), dtype=np.uint8)
        path = str(tmp_path / "img_0.png")
        PILImage.fromarray(rgba, "RGBA").save(path)

        out = native.decode_png_u8_native(path, 16, 12)
        np.testing.assert_array_equal(out, rgba)
        # dimension mismatch -> fallback signal
        assert native.decode_png_u8_native(path, 8, 6) is None

        # grayscale file
        gray = rng.integers(0, 256, (12, 16), dtype=np.uint8)
        gpath = str(tmp_path / "g.png")
        PILImage.fromarray(gray, "L").save(gpath)
        gout = native.decode_png_u8_native(gpath, 16, 12)
        np.testing.assert_array_equal(gout[..., 0], gray)
        np.testing.assert_array_equal(gout[..., 3], np.full_like(gray, 255))

    def test_sapien_dataset_native_matches_python(self, single_root):
        import os

        import aonerf.native as native

        if native.get_loader() is None:
            pytest.skip("no native toolchain")
        import numpy as np

        from aonerf.data.sapien import SapienDataset

        ds_nat = SapienDataset(single_root, "train", img_wh=(64, 48))
        os.environ["AONERF_NO_NATIVE"] = "1"
        native._lib_tried, native._lib = False, None
        try:
            ds_py = SapienDataset(single_root, "train", img_wh=(64, 48))
        finally:
            del os.environ["AONERF_NO_NATIVE"]
            native._lib_tried, native._lib = False, None
        np.testing.assert_array_equal(ds_nat.all_rays_o, ds_py.all_rays_o)
        np.testing.assert_allclose(ds_nat.all_rays_d, ds_py.all_rays_d, atol=3e-7)
        np.testing.assert_allclose(ds_nat.all_rgbs, ds_py.all_rgbs, atol=2e-7)


class TestDatagenDepthReplay:
    def test_depth_and_replay(self, tmp_path):
        """write_depth emits mm-uint16 PNGs; replay_scene re-renders saved
        poses bit-identically (reference: data_utils.py:89-95, :244-288)."""
        import json

        from PIL import Image

        from aonerf.data.synthetic import generate_single_scene, replay_scene

        root = str(tmp_path / "scene")
        generate_single_scene(root, img_wh=(40, 30), n_train=2, n_val=1, n_test=1,
                              write_depth=True, seed=7)
        d = np.asarray(Image.open(f"{root}/train/depth/r_0.png"))
        assert d.dtype == np.uint16
        assert d.max() > 2000  # camera orbits at ~4 m -> >2000 mm hits
        assert d.min() == 0  # background has no hit

        out = str(tmp_path / "replay")
        replay_scene(out, f"{root}/train/transforms.json", img_wh=(40, 30),
                     write_depth=True)
        a = np.asarray(Image.open(f"{root}/train/rgb/r_0.png"))
        b = np.asarray(Image.open(f"{out}/replay/rgb/r_0.png"))
        np.testing.assert_array_equal(a, b)
        with open(f"{out}/replay/transforms.json") as f:
            meta = json.load(f)
        assert "focal" in meta and "r_0" in meta["frames"]


class TestSapienBackendMath:
    """Pure-math pieces of the SAPIEN datagen backend, testable without the
    simulator (reference semantics: datagen/data_utils.py:60-140)."""

    def test_camera_extrinsic_looks_at_origin(self):
        from aonerf.data.datagen.sapien_backend import camera_extrinsic_mat44

        point = np.array([2.0, -1.0, 3.0])
        m = camera_extrinsic_mat44(point)
        # position column
        np.testing.assert_allclose(m[:3, 3], point)
        # SAPIEN convention: x column is forward = towards the origin
        fwd = m[:3, 0]
        np.testing.assert_allclose(fwd, -point / np.linalg.norm(point), atol=1e-12)
        # rotation is orthonormal, right-handed
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0.99
        # up column has positive z (camera not upside down)
        assert m[2, 2] > 0

    def test_sample_sphere_point_radius_band(self):
        from aonerf.data.datagen.sapien_backend import sample_sphere_point

        rng = np.random.default_rng(0)
        pts = np.stack([sample_sphere_point(rng, radius=4.0) for _ in range(200)])
        r = np.linalg.norm(pts, axis=1)
        assert np.all(r >= 3.5 - 1e-9) and np.all(r <= 4.5 + 1e-9)
        # full sphere: both hemispheres hit
        assert (pts[:, 2] > 0).any() and (pts[:, 2] < 0).any()

    def test_seg_masked_rgba(self):
        from aonerf.data.datagen.sapien_backend import seg_masked_rgba

        rgba = np.ones((2, 2, 4), np.float32)  # white, alpha 1
        seg = np.zeros((2, 2, 4), np.uint32)
        seg[0, 0] = 7  # only one pixel belongs to the object
        out = seg_masked_rgba(rgba, seg)
        assert out.dtype == np.uint8
        assert out[0, 0, 3] == 255
        assert out[0, 1, 3] == 0 and out[1, 1, 3] == 0
        np.testing.assert_array_equal(out[..., :3], 255)

    def test_depth_mm_u16(self):
        from aonerf.data.datagen.sapien_backend import depth_mm_u16

        pos = np.zeros((1, 2, 4), np.float32)
        pos[0, 0, 2] = -1.5  # camera-frame z: depth = 1.5 m
        pos[0, 1, 2] = -0.0005
        out = depth_mm_u16(pos)
        assert out.dtype == np.uint16
        assert out[0, 0] == 1500
        assert out[0, 1] == 0  # rounds down to 0 mm

    def test_qpos_and_focal(self):
        from aonerf.data.datagen.sapien_backend import focal_from_fovy, qpos_for_degrees

        q = qpos_for_degrees(2, 90.0)
        np.testing.assert_allclose(q, np.pi / 2)
        # focal must match the synthetic generator's (same 35-degree fovy)
        from aonerf.data.synthetic import FOVY_DEG

        f = focal_from_fovy(240)
        assert abs(f - 0.5 * 240 / np.tan(0.5 * np.deg2rad(FOVY_DEG))) < 1e-9

    def test_generate_dispatch_without_sapien(self):
        """Without the simulator the CLI falls back to the synthetic
        backend; with urdf config keys but no sapien it must NOT try the
        sapien path."""
        from aonerf.data.datagen.generate import have_sapien

        assert have_sapien() is False  # this image has no simulator


class TestBenchBufferSchema:
    def test_bench_synthetic_buffers_match_device_buffers_schema(self, tmp_path):
        """bench.py fabricates multi-config buffers for the autodecoder/ae
        throughput modes; they must stay byte-layout-compatible with the real
        SapienMultiDataset.device_buffers() schema or the benched program
        stops being the trained program."""
        import bench

        from aonerf.data.synthetic import generate_multi_scene
        from aonerf.data.sapien_multi import SapienMultiDataset

        root = str(tmp_path / "d")
        generate_multi_scene(root, img_wh=(16, 12), n_instances=1,
                             degrees=(0, 90), n_images=2)
        real = SapienMultiDataset(root, img_wh=(16, 12)).device_buffers()
        fake = bench._synthetic_multi_buffers(img_wh=(16, 12), n_i=1, n_d=2, n_v=2)
        assert set(fake) == set(real)
        for k in real:
            assert np.asarray(fake[k]).dtype == np.asarray(real[k]).dtype, k
            assert np.asarray(fake[k]).ndim == np.asarray(real[k]).ndim, k
            assert np.asarray(fake[k]).shape == np.asarray(real[k]).shape, k
