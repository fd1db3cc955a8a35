"""Ray generation: pinhole directions, world-space rays, NDC, spheric poses.

Reference parity: datasets/ray_utils.py:71-159 (get_ray_directions, get_rays),
:187-228 (NDC), datasets/sapien_multi.py:29-72 (create_spheric_poses).

Note on get_rays: the reference normalizes ``viewdirs`` in place, aliasing the
``rays_d`` tensor (ray_utils.py:145-148), so BOTH returned direction arrays are
unit-norm; the pre-normalization directions survive only inside the radii
computation. We reproduce that behavior (it matters for volumetric_rendering's
||dirs|| scaling, which becomes 1).
"""

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def get_ray_directions(h: int, w: int, focal: float) -> jnp.ndarray:
    """Per-pixel ray directions in camera frame, (H, W, 3).

    Convention: x right, y up, camera looks down -z; no +0.5 pixel centering
    (reference follows bmild/nerf issue #24).
    """
    j, i = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack(
        [(i - w / 2) / focal, -(j - h / 2) / focal, -jnp.ones_like(i)], axis=-1
    )


def get_rays(
    directions: jnp.ndarray, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World-space rays for one camera.

    directions: (H, W, 3) camera-frame directions; c2w: (3, 4).
    Returns (rays_o (HW,3), viewdirs (HW,3), rays_d (HW,3), radii (HW,1)).
    viewdirs and rays_d are both unit-norm (see module docstring); radii is
    the mip-NeRF pixel-footprint radius from the unnormalized directions.
    """
    rays_d_orig = directions @ c2w[:, :3].T  # (H, W, 3), unnormalized
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d_orig.shape)

    dx = jnp.sqrt(jnp.sum((rays_d_orig[:-1] - rays_d_orig[1:]) ** 2, axis=-1))
    dx = jnp.concatenate([dx, dx[-2:-1]], axis=0)
    radii = (dx[..., None] * 2.0 / np.sqrt(12.0)).reshape(-1, 1)

    viewdirs = rays_d_orig / jnp.linalg.norm(rays_d_orig, axis=-1, keepdims=True)
    viewdirs = viewdirs.reshape(-1, 3)
    rays_o = rays_o.reshape(-1, 3)
    return rays_o, viewdirs, viewdirs, radii


def get_ndc_rays(
    h: int,
    w: int,
    focal: float,
    near: float,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift rays to the near plane and project into NDC (ray_utils.py:187-228)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (w / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (h / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (w / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (h / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def create_spheric_poses(radius: float = 4.0, n_poses: int = 40, phi_deg: float = -30.0) -> np.ndarray:
    """Spheric camera path: c2w poses at elevation ``phi_deg`` circling the
    object (sapien_multi.py:29-72). Returns (n_poses, 4, 4) float32.
    Host-side (numpy): pose construction is data-pipeline work, not TPU work.
    """

    def trans_t(t):
        m = np.eye(4, dtype=np.float64)
        m[2, 3] = t
        return m

    def rot_phi(phi):
        c, s = np.cos(phi), np.sin(phi)
        return np.array(
            [[1, 0, 0, 0], [0, c, -s, 0], [0, s, c, 0], [0, 0, 0, 1]], dtype=np.float64
        )

    def rot_theta(th):
        c, s = np.cos(th), np.sin(th)
        return np.array(
            [[c, 0, -s, 0], [0, 1, 0, 0], [s, 0, c, 0], [0, 0, 0, 1]], dtype=np.float64
        )

    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float64
    )

    poses = []
    for theta in np.linspace(-180.0, 180.0, n_poses + 1)[:-1]:
        c2w = trans_t(radius)
        c2w = rot_phi(phi_deg / 180.0 * np.pi) @ c2w
        c2w = rot_theta(theta / 180.0 * np.pi) @ c2w
        poses.append(flip @ c2w)
    return np.stack(poses, axis=0).astype(np.float32)


def get_rays_background(
    directions: jnp.ndarray, c2w: jnp.ndarray, coords: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for a subset of pixel coordinates (ray_utils.py:93-116):
    coords (N, 2) as (row, col). Directions are unit-normalized here (the
    reference normalizes this variant)."""
    rays_d = directions @ c2w[:, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    rays_o = rays_o[coords[:, 0], coords[:, 1]]
    rays_d = rays_d[coords[:, 0], coords[:, 1]]
    return rays_o, rays_d


def transform_rays_camera(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-pose camera-frame rays by c2w (ray_utils.py:162-185): rotate
    directions (normalized) and translate origins."""
    rays_d = rays_d @ c2w[:, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape) + rays_o
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def world_to_ndc(
    points: jnp.ndarray, w: int, h: int, focal: float, near: float
) -> jnp.ndarray:
    """Project world points into the NDC cube (ray_utils.py:230-248)."""
    ox_oz = points[..., 0] / points[..., 2]
    oy_oz = points[..., 1] / points[..., 2]
    o0 = -1.0 / (w / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (h / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / points[..., 2]
    return jnp.stack([o0, o1, o2], axis=-1)


def get_rays_mvs(
    h: int, w: int, focal: float, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MVS-convention rays (+z forward, +y down; ray_utils.py:315-325)."""
    ys, xs = jnp.meshgrid(
        jnp.linspace(0, h - 1, h), jnp.linspace(0, w - 1, w), indexing="ij"
    )
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    dirs = jnp.stack([(xs - w / 2) / focal, (ys - h / 2) / focal, jnp.ones_like(xs)], -1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
