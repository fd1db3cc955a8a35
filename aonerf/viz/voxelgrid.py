"""Field-density voxel grids: occupancy extraction and PLY export.

Reference analogue: ``visualize_nerf/vis_voxel_grid.py`` (a pyvista mesh
slicer over a ShapeNet OBJ) and the geometry-inspection role of the
open3d viewer suite — the reference inspects GROUND-TRUTH geometry because
its torch field has no cheap grid-evaluation path.  Here the trained field
itself is the geometry: the whole N-cubed grid is evaluated in ONE jitted
dispatch (``lax.map`` over z-slabs, the same static-tile idiom as
eval/render.py::make_image_renderer), thresholded to occupied voxel
centers, and exported through viz/pointcloud.py::write_ply for any mesh
viewer.  Works for the vanilla field, the articulated field at any latent code
(per-instance, per-articulation snapshots), and the auto-encoder at
latents encoded from a source view.
"""

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aonerf.ops import encoding
from aonerf.viz.pointcloud import write_ply

DensityFn = Callable[[jnp.ndarray], jnp.ndarray]  # (B, S, 3) -> (B, S)


def nerf_density_fn(model, variables) -> DensityFn:
    """Density adapter for the vanilla field (models/nerf.py): fine-level
    MLP, view condition fixed to the +x direction (density does not depend
    on it), relu activation as in NeRF.__call__."""

    def fn(points: jnp.ndarray) -> jnp.ndarray:
        enc = encoding.pos_enc(points, model.min_deg_point, model.max_deg_point)
        cond = _fixed_view_cond(points, model.deg_view)
        _, raw_sigma = model.apply(
            variables, enc, cond, method=lambda m, e, c: m.fine_mlp(e, c)
        )
        return nn.relu(raw_sigma[..., 0])

    return fn


def _fixed_view_cond(points: jnp.ndarray, deg_view: int) -> jnp.ndarray:
    """Encoded +x view direction per row (density is view-independent)."""
    dirs = jnp.concatenate(
        [jnp.ones_like(points[:, :1, :1]), jnp.zeros_like(points[:, :1, :2])],
        axis=-1,
    )[:, 0]
    return encoding.pos_enc(dirs, 0, deg_view)


def _field_sigma(field, points, cond, latents) -> jnp.ndarray:
    """Fine-level density of an ArticulatedNeRF submodule with the field's
    OWN activation (softplus+bias or relu) and soft cap, so thresholds mean
    the same thing as in training.  Runs inside model.apply."""
    if field.enc_after:
        enc = points  # the MLP warps raw points, then encodes
    else:
        enc = encoding.pos_enc(points, field.min_deg_point, field.max_deg_point)
    _, raw_sigma = field.fine_mlp(enc, cond, latents)
    if field.sigma_activation == "softplus":
        sigma = nn.softplus(raw_sigma + field.density_bias)
    else:
        sigma = nn.relu(raw_sigma)
    if field.sigma_cap is not None:
        sigma = field.sigma_cap * jnp.tanh(sigma / field.sigma_cap)
    return sigma[..., 0]


def articulated_density_fn(model, variables, latents: Dict[str, jnp.ndarray]) -> DensityFn:
    """Density adapter for the articulated field (models/articulated.py) at
    fixed ``latents`` (density/color/articulation codes, (1, C) each —
    broadcast inside the MLP)."""

    def fn(points: jnp.ndarray) -> jnp.ndarray:
        cond = _fixed_view_cond(points, model.deg_view)
        return model.apply(
            variables, points, cond, latents,
            method=lambda m, p, c, l: _field_sigma(m, p, c, l),
        )

    return fn


def ae_density_fn(model, variables, latents: Dict[str, jnp.ndarray]) -> DensityFn:
    """Density adapter for the auto-encoder (models/ae.py) at encoded
    ``latents`` (e.g. from Trainer._params_latents_for): evaluates the
    ``field`` submodule's fine MLP with the field's own activation/cap."""

    def fn(points: jnp.ndarray) -> jnp.ndarray:
        cond = _fixed_view_cond(points, model.deg_view)
        return model.apply(
            variables, points, cond, latents,
            method=lambda m, p, c, l: _field_sigma(m.field, p, c, l),
        )

    return fn


def density_grid(
    density_fn: DensityFn,
    bbox_min=(-1.5, -1.5, -1.5),
    bbox_max=(1.5, 1.5, 1.5),
    resolution: int = 64,
) -> np.ndarray:
    """(R, R, R) density array at voxel CENTERS of the bbox, indexed
    [ix, iy, iz].  One compiled dispatch: lax.map over z-slabs, each slab a
    (R, R, 3) batch through ``density_fn`` (static shapes; no host loop)."""
    lo = jnp.asarray(bbox_min, dtype=jnp.float32)
    hi = jnp.asarray(bbox_max, dtype=jnp.float32)
    centers = [
        lo[a] + (hi[a] - lo[a]) * (jnp.arange(resolution) + 0.5) / resolution
        for a in range(3)
    ]

    @jax.jit
    def run():
        xs, ys = jnp.meshgrid(centers[0], centers[1], indexing="ij")

        def slab(z):
            pts = jnp.stack([xs, ys, jnp.full_like(xs, z)], axis=-1)
            return density_fn(pts)  # (R, R)

        return jnp.moveaxis(jax.lax.map(slab, centers[2]), 0, -1)  # (R, R, Rz)

    return np.asarray(jax.device_get(run()))


def occupied_points(
    grid: np.ndarray,
    bbox_min=(-1.5, -1.5, -1.5),
    bbox_max=(1.5, 1.5, 1.5),
    threshold: float = 10.0,
) -> np.ndarray:
    """(P, 3) world-space voxel centers with density above ``threshold``
    (σ=10 ⇒ per-voxel alpha ≈ 1-exp(-σ·δ) ≳ 0.37 at the default 3/64 voxel
    pitch — solidly inside the surface shell)."""
    res = grid.shape[0]
    idx = np.argwhere(grid > threshold)
    lo = np.asarray(bbox_min, dtype=np.float64)
    hi = np.asarray(bbox_max, dtype=np.float64)
    return lo + (hi - lo) * (idx + 0.5) / res


def export_occupancy_ply(
    path: str,
    density_fn: DensityFn,
    bbox_min=(-1.5, -1.5, -1.5),
    bbox_max=(1.5, 1.5, 1.5),
    resolution: int = 64,
    threshold: float = 10.0,
) -> Tuple[str, int]:
    """Extract the grid, threshold, write a point PLY; returns (path, count)."""
    grid = density_grid(density_fn, bbox_min, bbox_max, resolution)
    pts = occupied_points(grid, bbox_min, bbox_max, threshold)
    write_ply(path, pts.astype(np.float32))
    return path, int(len(pts))
