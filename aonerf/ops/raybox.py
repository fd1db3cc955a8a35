"""Ray-AABB intersection (vectorized slab test; no per-ray loops).

Reference parity:
  - get_ray_limits / get_ray_limits_box: models/vanilla_nerf/helper.py:29-102
    (cube of side ``box_side_length`` centered at origin; invalid rays get the
    min/max over valid rays; negatives clamped to 0)
  - bbox_intersection(_batch): datasets/ray_utils.py:15-65 (numba CPU kernel
    on the reference side; here a single fused jnp expression — zero direction
    components are nudged to 1e-14, rays originating inside the box report a
    miss, matching the reference's documented behavior)
"""

from typing import Tuple

import jax.numpy as jnp


def _slab(
    rays_o: jnp.ndarray, inv_d: jnp.ndarray, bounds_min: jnp.ndarray, bounds_max: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Core slab test. Returns (tmin, tmax, valid) for all rays at once."""
    lo = (bounds_min - rays_o) * inv_d
    hi = (bounds_max - rays_o) * inv_d
    t0 = jnp.minimum(lo, hi)  # per-axis entry
    t1 = jnp.maximum(lo, hi)  # per-axis exit
    # Progressive narrowing exactly as the reference's yz -> xz -> xy order
    # (invalidity checks use the running tmin/tmax, not the final ones).
    tmin, tmax = t0[..., 0], t1[..., 0]
    valid = jnp.ones(rays_o.shape[:-1], dtype=bool)
    for axis in (1, 2):
        valid = valid & ~((tmin > t1[..., axis]) | (t0[..., axis] > tmax))
        tmin = jnp.maximum(tmin, t0[..., axis])
        tmax = jnp.minimum(tmax, t1[..., axis])
    return tmin, tmax, valid


def ray_box_intersection(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, box_side_length: float = 2.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Entry/exit distances against the origin-centered cube.

    Returns (tmin (N,1), tmax (N,1)); invalid rays are marked tmin=-1, tmax=-2
    as in helper.py:100-101.
    """
    o = rays_o.reshape(-1, 3)
    d = rays_d.reshape(-1, 3)
    half = box_side_length / 2.0
    inv_d = 1.0 / d
    tmin, tmax, valid = _slab(o, inv_d, -half, half)
    tmin = jnp.where(valid, tmin, -1.0)
    tmax = jnp.where(valid, tmax, -2.0)
    shape = (*rays_o.shape[:-1], 1)
    return tmin.reshape(shape), tmax.reshape(shape)


def get_ray_limits(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, box_side_length: float = 2.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray [near, far] against the cube, with invalid rays filled from the
    valid population (helper.py:29-39) and negatives clamped to 0."""
    near, far = ray_box_intersection(rays_o, rays_d, box_side_length)
    valid = far > near
    any_valid = jnp.any(valid)
    big = jnp.asarray(jnp.finfo(near.dtype).max, near.dtype)
    min_valid_near = jnp.min(jnp.where(valid, near, big))
    max_valid_far = jnp.max(jnp.where(valid, far, -big))
    near = jnp.where(valid | ~any_valid, near, min_valid_near)
    far = jnp.where(valid | ~any_valid, far, max_valid_far)
    near = jnp.maximum(near, 0.0)
    far = jnp.maximum(far, 0.0)
    return near, far


def bbox_intersection_batch(
    bounds: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched intersection with an arbitrary AABB ``bounds = [min, max]``.

    Returns (hit (N,), tmin (N,), tmax (N,)); a ray whose origin is inside the
    box (tmin < 0 or tmax < 0) reports hit=False with tmin=tmax=0, matching
    ray_utils.py:62-65.
    """
    d = jnp.where(rays_d == 0.0, 1.0e-14, rays_d)
    inv_d = 1.0 / d
    tmin, tmax, valid = _slab(rays_o, inv_d, bounds[0], bounds[1])
    hit = valid & (tmin >= 0.0) & (tmax >= 0.0)
    zero = jnp.zeros_like(tmin)
    return hit, jnp.where(hit, tmin, zero), jnp.where(hit, tmax, zero)
