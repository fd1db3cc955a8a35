"""Tests for aonerf.viz.conventions — the multi-convention camera loaders
replacing the reference's visualize_nerf/ per-dataset viewer suite.

Every loader fixture is synthesized in the dataset's on-disk format with
cameras at KNOWN world positions looking at the origin, so the assertions
check real convention semantics (centers, look directions, handedness), not
just shapes.
"""

import json
import os

import numpy as np
import pytest

from aonerf.data.camera import look_at_c2w
from aonerf.viz import conventions as cv


def _look_at_cv_w2c(eye, center=(0.0, 0.0, 0.0)):
    """OpenCV-convention w2c (R, t) for a camera at ``eye`` looking at
    ``center``: +z forward toward the target, +y down."""
    eye = np.asarray(eye, dtype=np.float64)
    center = np.asarray(center, dtype=np.float64)
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(up, fwd)) > 0.99:
        up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)  # rows: camera axes in world
    t = -R @ eye
    return R, t


def _assert_valid_gl_c2ws(c2ws, eyes=None, target=(0, 0, 0), atol=2e-6):
    # atol covers float32 fixture poses (look_at_c2w / create_spheric_poses)
    c2ws = np.asarray(c2ws)
    assert c2ws.shape[1:] == (4, 4)
    for i, m in enumerate(c2ws):
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=atol)
        assert np.linalg.det(R) > 0.0  # right-handed after the convention fix
        np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-12)
        if eyes is not None:
            np.testing.assert_allclose(m[:3, 3], eyes[i], atol=atol)
            look = -R[:, 2]  # OpenGL: camera looks along -z
            to_target = np.asarray(target, dtype=np.float64) - m[:3, 3]
            to_target /= np.linalg.norm(to_target)
            np.testing.assert_allclose(look, to_target, atol=atol)


EYES = np.array([[3.0, 0.5, 1.0], [-2.0, 2.0, 1.5], [0.5, -3.0, 2.0]])


class TestSRN:
    def test_loader_centers_and_look_dirs(self, tmp_path):
        os.makedirs(tmp_path / "pose")
        for i, eye in enumerate(EYES):
            # SRN poses are c2w in OpenCV camera axes (x right, y down,
            # z forward): columns of R are the camera axes in world.
            R, _ = _look_at_cv_w2c(eye)
            c2w = np.eye(4)
            c2w[:3, :3] = R.T
            c2w[:3, 3] = eye
            np.savetxt(tmp_path / "pose" / f"{i:06d}.txt", c2w.reshape(1, 16))
        (tmp_path / "intrinsics.txt").write_text("131.25 64.0 64.0\n0. 0. 0.\n1.\n128 128\n")

        cams = cv.load_srn(str(tmp_path))
        assert len(cams) == 3
        assert cams.focal == pytest.approx(131.25)
        assert cams.img_wh == (128, 128)
        _assert_valid_gl_c2ws(cams.c2ws, EYES)


class TestBlender:
    def test_loader_focal_and_poses(self, tmp_path):
        frames = [{"transform_matrix": look_at_c2w(e, np.zeros(3), np.array([0, 0, 1.0])).tolist()}
                  for e in EYES]
        meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
        (tmp_path / "transforms_train.json").write_text(json.dumps(meta))

        cams = cv.load_blender(str(tmp_path), "train", img_wh=(800, 800))
        assert cams.focal == pytest.approx(0.5 * 800 / np.tan(0.5 * meta["camera_angle_x"]))
        _assert_valid_gl_c2ws(cams.c2ws, EYES)


class TestProjectionDecomposition:
    def test_roundtrip_recovers_K_R_center(self):
        K = np.array([[420.0, 0.0, 200.0], [0.0, 415.0, 150.0], [0.0, 0.0, 1.0]])
        R, t = _look_at_cv_w2c([2.0, -1.0, 1.2])
        P = K @ np.concatenate([R, t[:, None]], axis=1)

        K2, R2, c2 = cv.decompose_projection(4.2 * P)  # scale-invariant
        np.testing.assert_allclose(K2, K, atol=1e-8)
        np.testing.assert_allclose(R2, R, atol=1e-8)
        np.testing.assert_allclose(c2, [2.0, -1.0, 1.2], atol=1e-8)


class TestDTU:
    def _write_npz(self, path, name, with_scale):
        K = np.array([[400.0, 0.0, 200.0], [0.0, 400.0, 150.0], [0.0, 0.0, 1.0]])
        arrays = {}
        for i, eye in enumerate(EYES):
            R, t = _look_at_cv_w2c(eye)
            arrays[f"world_mat_{i}"] = K @ np.concatenate([R, t[:, None]], axis=1)
            if with_scale:
                s = np.eye(4)
                s[:3, :3] *= 2.0
                s[:3, 3] = [0.1, 0.2, 0.3]
                arrays[f"scale_mat_{i}"] = s
        np.savez(os.path.join(path, name), **arrays)

    def test_centers_world_flip_no_scale(self, tmp_path):
        self._write_npz(tmp_path, "cameras.npz", with_scale=False)
        cams = cv.load_dtu(str(tmp_path))
        assert cams.focal == pytest.approx(400.0)
        # world frame is flipped by diag(1,-1,-1) (reference _coord_trans_world)
        flipped = EYES * np.array([1.0, -1.0, -1.0])
        _assert_valid_gl_c2ws(cams.c2ws, flipped)

    def test_scale_mat_normalizes_centers(self, tmp_path):
        self._write_npz(tmp_path, "cameras.npz", with_scale=True)
        cams = cv.load_dtu(str(tmp_path))
        expect = (EYES - np.array([0.1, 0.2, 0.3])) / 2.0 * np.array([1.0, -1.0, -1.0])
        np.testing.assert_allclose(cams.centers(), expect, atol=1e-7)

    def test_neus_alias_reads_cameras_sphere(self, tmp_path):
        self._write_npz(tmp_path, "cameras_sphere.npz", with_scale=False)
        cams = cv.load_neus(str(tmp_path))
        assert cams.convention == "neus"
        assert len(cams) == 3


class TestReplica:
    def test_rt_inversion(self, tmp_path):
        data = []
        for eye in EYES:
            c2w = look_at_c2w(eye, np.zeros(3), np.array([0, 0, 1.0]))
            c2w4 = np.eye(4)
            c2w4[:3, :4] = c2w[:3, :4]
            K = np.eye(3)
            data.append({"Rt": np.linalg.inv(c2w4).tolist(), "K": K.tolist()})
        path = tmp_path / "cameras.json"
        path.write_text(json.dumps(data))

        cams = cv.load_replica(str(path), img_wh=(512, 512))
        _assert_valid_gl_c2ws(cams.c2ws, EYES)
        assert cams.focal == pytest.approx(256.0)  # K00=1 * (W/2)/tan(45deg)


class TestColmap:
    def _write_model(self, root, with_points=True):
        model = os.path.join(root, "sparse", "0")
        os.makedirs(model)
        with open(os.path.join(model, "cameras.txt"), "w") as f:
            f.write("# cameras\n1 SIMPLE_PINHOLE 640 480 500.0 320 240\n")
        with open(os.path.join(model, "images.txt"), "w") as f:
            f.write("# images\n")
            from aonerf.utils.transforms import matrix_to_quat

            for i, eye in enumerate(EYES):
                R, t = _look_at_cv_w2c(eye)
                q = matrix_to_quat(R)
                vals = " ".join(f"{v:.12f}" for v in list(q) + list(t))
                f.write(f"{i + 1} {vals} 1 im{i}.png\n")
                # the POINTS2D line must be skipped — and may be EMPTY
                # (an image with zero observations must not shift pairing)
                f.write("1.0 2.0 -1\n" if i != 1 else "\n")
        if with_points:
            with open(os.path.join(model, "points3D.txt"), "w") as f:
                f.write("# points\n7 0.5 0.25 -0.125 200 10 10 0.4 1 2\n")

    def test_poses_points_and_focal_rescale(self, tmp_path):
        self._write_model(str(tmp_path))
        cams = cv.load_colmap(str(tmp_path), img_wh=(320, 240))
        assert cams.focal == pytest.approx(250.0)  # 500 * 320/640
        _assert_valid_gl_c2ws(cams.c2ws, EYES)
        np.testing.assert_allclose(cams.points, [[0.5, 0.25, -0.125]])

    def test_native_resolution_default(self, tmp_path):
        self._write_model(str(tmp_path), with_points=False)
        cams = cv.load_colmap(str(tmp_path))
        assert cams.img_wh == (640, 480)
        assert cams.focal == pytest.approx(500.0)
        assert cams.points is None


class TestPytorch3D:
    def test_identity_camera_geometry(self):
        # PyTorch3D (R=I, T=(0,0,2.7)): world origin 2.7 units IN FRONT of
        # the camera; camera center at (0,0,-2.7) looking toward origin.
        c2w = cv.from_pytorch3d(np.eye(3), np.array([0.0, 0.0, 2.7]))
        np.testing.assert_allclose(c2w[:3, 3], [0, 0, -2.7], atol=1e-12)
        np.testing.assert_allclose(-c2w[:3, 2], [0, 0, 1.0], atol=1e-12)  # look +z
        assert np.linalg.det(c2w[:3, :3]) == pytest.approx(1.0)

    def test_frame_annotation_loader(self):
        frames = [
            {
                "viewpoint": {"R": np.eye(3).tolist(), "T": [0.0, 0.0, 2.7],
                              "focal_length": [2.0, 2.0]},
                "image": {"size": [300, 400]},
            }
        ]
        cams = cv.load_co3d_frames(frames)
        assert cams.img_wh == (400, 300)
        assert cams.focal == pytest.approx(2.0 * 300 / 2.0)
        _assert_valid_gl_c2ws(cams.c2ws, [[0, 0, -2.7]])


class TestSphericAndAxisAlign:
    def test_spheric_orbit_looks_at_origin(self):
        cams = cv.spheric_cameras(radius=4.0, n_poses=8, phi_deg=-30.0)
        assert len(cams) == 8
        np.testing.assert_allclose(
            np.linalg.norm(cams.centers(), axis=1), 4.0, atol=1e-5
        )
        _assert_valid_gl_c2ws(cams.c2ws, cams.centers())  # looks at origin

    def test_axis_align_translates_centers_and_points(self):
        cams = cv.spheric_cameras(radius=4.0, n_poses=4)
        cams.points = np.array([[0.5, 0.5, 0.5], [-1.0, 0.0, 2.0]])
        box = np.eye(4)
        box[:3, 3] = [1.0, -2.0, 0.5]
        aligned = cv.axis_align(cams, box)
        np.testing.assert_allclose(
            aligned.centers(), cams.centers() - [1.0, -2.0, 0.5], atol=1e-5
        )
        # context points move WITH the cameras into the box frame
        np.testing.assert_allclose(
            aligned.points, cams.points - [1.0, -2.0, 0.5], atol=1e-12
        )


class TestBoxUtils:
    def test_bbox_corners(self):
        corners = cv.get_3d_bbox([2.0, 4.0, 6.0], shift=[1.0, 0.0, 0.0])
        assert corners.shape == (8, 3)
        np.testing.assert_allclose(corners.min(axis=0), [0.0, -2.0, -3.0])
        np.testing.assert_allclose(corners.max(axis=0), [2.0, 2.0, 3.0])

    def test_project_points_principal_point(self):
        K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
        R, t = _look_at_cv_w2c([0.0, -4.0, 0.0])
        w2c = np.eye(4)
        w2c[:3, :3], w2c[:3, 3] = R, t
        # the look-at target projects exactly to the principal point
        uv = cv.project_points(K, w2c, np.zeros((1, 3)))
        np.testing.assert_allclose(uv, [[320.0, 240.0]], atol=1e-9)


class TestFrustumGeometry:
    def test_frustum_apex_and_edges(self):
        c2w = look_at_c2w(np.array([0.0, -3.0, 0.0]), np.zeros(3), np.array([0, 0, 1.0]))
        pts, lines = cv.camera_frustum((320, 240), 280.0, c2w, frustum_length=0.5)
        assert pts.shape == (5, 3) and lines.shape == (8, 2)
        np.testing.assert_allclose(pts[0], [0.0, -3.0, 0.0], atol=1e-12)
        # corners sit in FRONT of the camera (toward the origin: y > -3)
        assert (pts[1:, 1] > -3.0).all()
        # corner depth along the look axis equals frustum_length
        look = -c2w[:3, 2]
        depth = (pts[1:] - pts[0]) @ look
        np.testing.assert_allclose(depth, 0.5, atol=1e-12)

    def test_lineset_merge_offsets(self):
        cams = cv.spheric_cameras(radius=4.0, n_poses=3)
        pts, lines = cv.cameraset_lineset(cams)
        assert pts.shape == (15, 3) and lines.shape == (24, 2)
        assert lines[:8].max() <= 4 and lines[8:16].min() >= 5

    def test_ply_roundtrip(self, tmp_path):
        cams = cv.spheric_cameras(radius=4.0, n_poses=2)
        pts, lines = cv.cameraset_lineset(cams)
        path = cv.write_lineset_ply(str(tmp_path / "cams.ply"), pts, lines)
        text = open(path).read().splitlines()
        assert text[0] == "ply"
        n_vert = int([l for l in text if l.startswith("element vertex")][0].split()[-1])
        n_edge = int([l for l in text if l.startswith("element edge")][0].split()[-1])
        assert (n_vert, n_edge) == (10, 16)
        body = text[text.index("end_header") + 1:]
        got = np.array([[float(v) for v in body[0].split()]])
        np.testing.assert_allclose(got, pts[:1], atol=1e-6)


class TestDispatchAndCLI:
    def test_unknown_convention_raises(self):
        with pytest.raises(ValueError, match="unknown camera convention"):
            cv.load_cameras("lidar", "/nope")

    def test_check_poses_convention_route(self, tmp_path, capsys):
        # SRN fixture validated through check_poses --convention srn
        os.makedirs(tmp_path / "pose")
        for i, eye in enumerate(EYES):
            R, _ = _look_at_cv_w2c(eye)
            c2w = np.eye(4)
            c2w[:3, :3] = R.T
            c2w[:3, 3] = eye
            np.savetxt(tmp_path / "pose" / f"{i:06d}.txt", c2w.reshape(1, 16))
        (tmp_path / "intrinsics.txt").write_text("131.25 64.0 64.0\n128 128\n")

        from aonerf.viz.check_poses import main as check_main

        check_main(["--root", str(tmp_path), "--convention", "srn"])
        report = json.loads(capsys.readouterr().out)
        assert report["ok"] and report["convention"] == "srn"
        assert report["n_cameras"] == 3 and report["has_focal"]

    def test_cli_end_to_end_sapien(self, tmp_path):
        os.makedirs(tmp_path / "data" / "train")
        frames = {
            f"r_{i}": look_at_c2w(e, np.zeros(3), np.array([0, 0, 1.0])).tolist()
            for i, e in enumerate(EYES)
        }
        meta = {"camera_angle_x": 0.8, "frames": frames}
        (tmp_path / "data" / "train" / "transforms.json").write_text(json.dumps(meta))

        out_png = tmp_path / "cams.png"
        out_ply = tmp_path / "cams.ply"
        cv.main([
            "--convention", "sapien", "--root", str(tmp_path / "data"),
            "--out", str(out_png), "--ply", str(out_ply),
        ])
        assert out_png.exists() and out_ply.exists()
