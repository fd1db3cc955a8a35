"""Tests for the auxiliary utilities: extra ray helpers, segmented sampling,
val grids, LPIPS plumbing with synthetic weights."""

import jax.numpy as jnp
import numpy as np

from aonerf import ops
from aonerf.data.segmented import build_seg_mask, get_rays_segmented
from aonerf.eval.viz import colorize_depth, visualize_val_rgb_opa_depth
from aonerf.ops.rays import (
    get_rays_background,
    get_rays_mvs,
    transform_rays_camera,
    world_to_ndc,
)


class TestExtraRays:
    def test_background_subset(self):
        dirs = ops.get_ray_directions(4, 4, 5.0)
        c2w = jnp.asarray(np.hstack([np.eye(3), [[0], [0], [4.0]]]).astype(np.float32))
        coords = jnp.asarray([[0, 0], [3, 3]])
        o, d = get_rays_background(dirs, c2w, coords)
        assert o.shape == (2, 3) and d.shape == (2, 3)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6)

    def test_transform_rays_camera(self):
        o = jnp.zeros((4, 3))
        d = jnp.asarray(np.tile([0, 0, -1.0], (4, 1)).astype(np.float32))
        c2w = jnp.asarray(np.hstack([np.eye(3), [[1], [2], [3.0]]]).astype(np.float32))
        o2, d2 = transform_rays_camera(o, d, c2w)
        np.testing.assert_allclose(np.asarray(o2), np.tile([1, 2, 3], (4, 1)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d2), np.tile([0, 0, -1], (4, 1)), atol=1e-6)

    def test_world_to_ndc_consistency(self):
        """NDC of the ray origin must match get_ndc_rays' origin output."""
        o = jnp.asarray([[0.3, -0.2, -2.5]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        no, _ = ops.get_ndc_rays(8, 8, 4.0, 1.0, o, d)
        # shift o to the near plane first, as get_ndc_rays does
        t = -(1.0 + o[..., 2]) / d[..., 2]
        o_near = o + t[..., None] * d
        pts = world_to_ndc(o_near, 8, 8, 4.0, 1.0)
        np.testing.assert_allclose(np.asarray(pts), np.asarray(no), atol=1e-6)

    def test_mvs_rays(self):
        c2w = jnp.asarray(np.hstack([np.eye(3), [[0], [0], [0.0]]]).astype(np.float32))
        o, d = get_rays_mvs(4, 4, 5.0, c2w)
        assert o.shape == (16, 3)
        # +z forward convention
        assert np.all(np.asarray(d)[:, 2] > 0)


class TestSegmented:
    def test_build_and_sample(self):
        h, w = 8, 8
        masks = np.zeros((h, w, 2), bool)
        masks[:4, :, 0] = True  # class 5 top half
        masks[4:, :, 1] = True  # class 7 bottom half
        seg = build_seg_mask(masks, [5, 7])
        assert set(np.unique(seg)) == {5, 7}

        rng = np.random.default_rng(0)
        rays_o = np.arange(h * w * 3, dtype=np.float32).reshape(h * w, 3)
        rays_d = rays_o + 0.5
        per_o, per_d, ids, fg = get_rays_segmented(
            masks, [5, 7], rays_o, rays_d, w, h, n_rays=16, rng=rng
        )
        assert ids == [5, 7]
        assert per_o[0].shape == (16, 3)
        # class 5 rays come only from the top half (flat idx < 32)
        assert np.all(per_o[0][:, 0] < 32 * 3)
        assert np.all(per_o[1][:, 0] >= 32 * 3)
        assert fg.all()  # every pixel belongs to a class here


class TestVizGrid:
    def test_grid_shape(self):
        h, w = 6, 8
        rng = np.random.default_rng(0)
        target = rng.uniform(size=(h * w, 3))
        rgb = rng.uniform(size=(h * w, 3))
        depth = rng.uniform(2, 6, size=(h * w,))
        acc = rng.uniform(size=(h * w,))
        grid = visualize_val_rgb_opa_depth((w, h), target, rgb, depth, acc)
        assert grid.shape == (h, w * 4, 3)
        assert grid.dtype == np.uint8

    def test_depth_colormap_range(self):
        d = np.linspace(0, 1, 64).reshape(8, 8)
        c = colorize_depth(d)
        assert c.shape == (8, 8, 3) and c.dtype == np.uint8
        assert c.max() > 200  # uses the full range


class TestLPIPSPlumbing:
    def test_forward_with_synthetic_weights(self, tmp_path):
        """Random VGG weights exercise the full LPIPS graph: identical images
        must give 0, different images > 0."""
        from aonerf.eval.lpips import _CONV_IDXS, lpips_from_npz

        rng = np.random.default_rng(0)
        weights = {}
        cin = 3
        widths = {0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
                  17: 512, 19: 512, 21: 512, 24: 512, 26: 512, 28: 512}
        for idx in _CONV_IDXS:
            cout = widths[idx]
            weights[f"features_{idx}_kernel"] = rng.standard_normal(
                (3, 3, cin, cout)
            ).astype(np.float32) * 0.05
            weights[f"features_{idx}_bias"] = np.zeros(cout, np.float32)
            cin = cout
        for j, c in enumerate([64, 128, 256, 512, 512]):
            weights[f"lin_{j}_kernel"] = np.abs(
                rng.standard_normal(c).astype(np.float32)
            )
        path = str(tmp_path / "w.npz")
        np.savez(path, **weights)

        img = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        img2 = jnp.asarray(rng.uniform(size=(64, 64, 3)).astype(np.float32))
        same = float(lpips_from_npz(path, img, img))
        diff = float(lpips_from_npz(path, img, img2))
        assert abs(same) < 1e-6
        assert diff > 0
