"""Tests for the headless diagnostics suite (viz/) and transform utils."""

import json
import os

import numpy as np
import pytest

from aonerf.data.camera import get_ray_directions_np, look_at_c2w
from aonerf.utils.transforms import (
    axis_angle_to_matrix,
    compose_c2w,
    euler_xyz_to_matrix,
    invert_se3,
    matrix_to_axis_angle,
    matrix_to_quat,
    quat_to_matrix,
)
from aonerf.viz.check_poses import check_poses
from aonerf.viz.pointcloud import depth_to_points, write_ply


def random_rotation(rng):
    q = rng.standard_normal(4)
    return quat_to_matrix(q / np.linalg.norm(q))


class TestTransforms:
    def test_quat_matrix_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            q = rng.standard_normal(4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            m = quat_to_matrix(q)
            assert np.allclose(m @ m.T, np.eye(3), atol=1e-12)
            assert np.isclose(np.linalg.det(m), 1.0)
            np.testing.assert_allclose(matrix_to_quat(m), q, atol=1e-10)

    def test_axis_angle_roundtrip(self):
        rng = np.random.default_rng(1)
        for angle in (0.3, 1.5, 3.0, np.pi - 1e-9):
            axis = rng.standard_normal(3)
            axis /= np.linalg.norm(axis)
            m = axis_angle_to_matrix(axis, angle)
            a2, ang2 = matrix_to_axis_angle(m)
            assert np.isclose(ang2, angle, atol=1e-6)
            # axis sign is arbitrary at pi
            assert min(
                np.abs(a2 - axis).max(), np.abs(a2 + axis).max()
            ) < (1e-6 if angle < 3 else 1e-3)

    def test_euler_and_se3(self):
        m = euler_xyz_to_matrix(0.2, -0.4, 1.1)
        assert np.allclose(m @ m.T, np.eye(3), atol=1e-12)
        c2w = compose_c2w(m, [1.0, 2.0, 3.0])
        np.testing.assert_allclose(invert_se3(c2w) @ c2w, np.eye(4), atol=1e-12)


class TestCheckPoses:
    def test_good_lookat_poses_pass(self):
        c2ws = np.stack([
            look_at_c2w(
                np.array([4 * np.cos(a), 4 * np.sin(a), 2.0]),
                np.zeros(3),
                np.array([0.0, 0.0, 1.0]),
            )
            for a in np.linspace(0, 2 * np.pi, 8, endpoint=False)
        ])
        rep = check_poses(c2ws, expect_radius=np.sqrt(20.0), radius_tol=0.5)
        assert rep["ok"]
        assert rep["radius"]["n_outside_expected"] == 0
        assert rep["lookat_origin"]["min_cos"] > 0.99

    def test_bad_rotation_flagged(self):
        c2w = np.eye(4)
        c2w[:3, :3] *= 2.0  # not orthonormal
        rep = check_poses(c2w[None])
        assert not rep["ok"]
        assert rep["orthonormal"]["n_bad"] == 1


class TestPointCloud:
    def test_backprojection_hits_known_plane(self, tmp_path):
        # camera at origin looking down -z; a plane at z=-2 has depth 2
        # in the unnormalized-direction convention (t such that o + t*d,
        # d_z = -1 -> z = -t).
        h, w, focal = 10, 12, 20.0
        c2w = np.eye(4)[:3, :4]
        depth = np.full((h, w), 2.0)
        pts = depth_to_points(depth, c2w, focal)
        assert pts.shape == (h * w, 3)
        np.testing.assert_allclose(pts[:, 2], -2.0, atol=1e-6)

        rgb = np.zeros((h, w, 3))
        rgb[..., 0] = 1.0
        pts6 = depth_to_points(depth, c2w, focal, rgb=rgb, stride=2)
        assert pts6.shape[1] == 6
        assert len(pts6) == (h // 2) * (w // 2)

        ply = write_ply(str(tmp_path / "c.ply"), pts6)
        head = open(ply).read().splitlines()
        assert head[0] == "ply"
        assert f"element vertex {len(pts6)}" in head[2]


class TestCameraVizCli:
    def test_plot_cameras_writes_png(self, tmp_path):
        pytest.importorskip("matplotlib")
        from aonerf.viz.cameras import plot_cameras

        c2ws = [np.eye(4) for _ in range(3)]
        out = plot_cameras(c2ws, str(tmp_path / "cams.png"), focal=30.0)
        assert os.path.exists(out)
