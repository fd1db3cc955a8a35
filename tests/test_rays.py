"""Tests for ray generation, NDC, spheric poses, and ray-AABB intersection."""

import jax.numpy as jnp
import numpy as np

from aonerf import ops
from tests import oracles


class TestRayDirections:
    def test_center_pixel_looks_forward(self):
        h, w, f = 4, 6, 10.0
        dirs = np.asarray(ops.get_ray_directions(h, w, f))
        assert dirs.shape == (h, w, 3)
        # pixel (j=h/2, i=w/2) maps to (0, 0, -1)
        np.testing.assert_allclose(dirs[h // 2, w // 2], [0, 0, -1], atol=1e-6)
        # +i moves right (+x), +j moves down (-y)
        assert dirs[0, w - 1, 0] > dirs[0, 0, 0]
        assert dirs[h - 1, 0, 1] < dirs[0, 0, 1]

    def test_focal_scaling(self):
        d1 = np.asarray(ops.get_ray_directions(8, 8, 10.0))
        d2 = np.asarray(ops.get_ray_directions(8, 8, 20.0))
        np.testing.assert_allclose(d1[0, 0, :2], 2 * d2[0, 0, :2], rtol=1e-6)


class TestGetRays:
    def test_identity_pose(self):
        h, w, f = 5, 5, 7.0
        dirs = ops.get_ray_directions(h, w, f)
        c2w = jnp.asarray(np.hstack([np.eye(3), np.array([[1.0], [2.0], [3.0]])]).astype(np.float32))
        o, viewdirs, rays_d, radii = ops.get_rays(dirs, c2w)
        assert o.shape == (h * w, 3) and radii.shape == (h * w, 1)
        np.testing.assert_allclose(np.asarray(o), np.tile([1, 2, 3], (h * w, 1)), atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(viewdirs), axis=-1), 1.0, atol=1e-6
        )
        # reference aliasing quirk: rays_d is normalized too
        np.testing.assert_allclose(np.asarray(rays_d), np.asarray(viewdirs), atol=0)

    def test_rotation_applied(self):
        # even dims: pixel (h/2, w/2) is exactly on-axis (no +0.5 centering)
        h, w, f = 4, 4, 5.0
        dirs = ops.get_ray_directions(h, w, f)
        # 90 deg rotation about x: y->z, z->-y
        rot = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], dtype=np.float32)
        c2w = jnp.asarray(np.hstack([rot, np.zeros((3, 1), np.float32)]))
        _, viewdirs, _, _ = ops.get_rays(dirs, c2w)
        center = np.asarray(viewdirs).reshape(h, w, 3)[h // 2, w // 2]
        np.testing.assert_allclose(center, [0, 1, 0], atol=1e-6)


class TestNDC:
    def test_rays_at_near_plane(self):
        o = jnp.asarray([[0.0, 0.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        no, nd = ops.get_ndc_rays(8, 8, 4.0, 1.0, o, d)
        # origin shifted to z=-near -> o2 = 1 + 2*near/(-near) = -1
        np.testing.assert_allclose(np.asarray(no)[0, 2], -1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(nd)[0, 2], 2.0, atol=1e-6)


class TestSphericPoses:
    def test_shape_and_radius(self):
        poses = ops.create_spheric_poses(radius=4.0)
        assert poses.shape == (40, 4, 4)
        centers = poses[:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(centers, axis=-1), 4.0, rtol=1e-5)
        # constant elevation: the axis-flip maps the invariant coordinate to z
        assert np.ptp(centers[:, 2]) < 1e-4

    def test_rotations_orthonormal(self):
        poses = ops.create_spheric_poses(radius=4.0)
        for p in poses[:5]:
            r = p[:3, :3]
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


class TestRayBox:
    def test_hit_through_origin(self):
        o = jnp.asarray([[0.0, 0.0, 5.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        tmin, tmax = ops.ray_box_intersection(o, d, box_side_length=2.0)
        np.testing.assert_allclose(float(tmin[0, 0]), 4.0, atol=1e-5)
        np.testing.assert_allclose(float(tmax[0, 0]), 6.0, atol=1e-5)

    def test_miss_marked_invalid(self):
        o = jnp.asarray([[0.0, 5.0, 5.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        tmin, tmax = ops.ray_box_intersection(o, d, box_side_length=2.0)
        assert float(tmin[0, 0]) == -1.0 and float(tmax[0, 0]) == -2.0

    def test_matches_scalar_oracle(self):
        rng = np.random.default_rng(2)
        o = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
        d = rng.standard_normal((64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        tmin, tmax = ops.ray_box_intersection(jnp.asarray(o), jnp.asarray(d), 2.0)
        tmin, tmax = np.asarray(tmin)[:, 0], np.asarray(tmax)[:, 0]
        for i in range(64):
            valid, lo, hi = oracles.ray_aabb_np(o[i], d[i], 1.0)
            if valid:
                np.testing.assert_allclose(tmin[i], lo, atol=1e-4)
                np.testing.assert_allclose(tmax[i], hi, atol=1e-4)
            else:
                assert tmin[i] == -1.0 and tmax[i] == -2.0

    def test_get_ray_limits_fills_invalid(self):
        o = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 5.0, 5.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        near, far = ops.get_ray_limits(o, d, 2.0)
        near, far = np.asarray(near), np.asarray(far)
        np.testing.assert_allclose(near[0, 0], 4.0, atol=1e-5)
        np.testing.assert_allclose(far[0, 0], 6.0, atol=1e-5)
        # invalid ray takes valid population min/max
        np.testing.assert_allclose(near[1, 0], 4.0, atol=1e-5)
        np.testing.assert_allclose(far[1, 0], 6.0, atol=1e-5)

    def test_bbox_intersection_batch_inside_box_miss(self):
        bounds = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
        o = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 5.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        hit, tmin, tmax = ops.raybox.bbox_intersection_batch(bounds, o, d)
        assert not bool(hit[0])  # origin inside -> miss (reference behavior)
        assert bool(hit[1])
        np.testing.assert_allclose(float(tmin[1]), 4.0, atol=1e-5)
