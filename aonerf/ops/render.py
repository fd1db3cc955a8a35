"""Differentiable volume-rendering integrator (alpha compositing).

Reference parity: models/vanilla_nerf/helper.py:157-195, including:
  - last-interval distance = 1e10
  - distances scaled by ||dirs||
  - transmittance = exclusive cumprod of (1 - alpha + 1e-10)
  - depth = sum(w * t), nan -> inf, clamped into [min, max] of itself
  - white background composite: rgb + (1 - acc)
  - optional NOCS compositing branch
"""

from typing import Optional, Tuple

import jax.numpy as jnp

_EPS = 1e-10


def volumetric_rendering(
    rgb: jnp.ndarray,
    density: jnp.ndarray,
    t_vals: jnp.ndarray,
    dirs: jnp.ndarray,
    white_bkgd: bool,
    nocs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample rgb/density along rays.

    rgb: (..., S, 3); density: (..., S, 1); t_vals: (..., S); dirs: (..., 3).
    Returns (comp_rgb, acc, weights, depth) — or (comp_rgb, acc, weights,
    comp_nocs) when ``nocs`` is given, matching the reference's return shape.
    """
    dists = jnp.concatenate(
        [
            t_vals[..., 1:] - t_vals[..., :-1],
            jnp.full_like(t_vals[..., :1], 1e10),
        ],
        axis=-1,
    )
    dists = dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    alpha = 1.0 - jnp.exp(-density[..., 0] * dists)
    # Exclusive cumulative product of survival probabilities (+eps as in ref).
    accum_prod = jnp.concatenate(
        [
            jnp.ones_like(alpha[..., :1]),
            jnp.cumprod(1.0 - alpha[..., :-1] + _EPS, axis=-1),
        ],
        axis=-1,
    )
    weights = alpha * accum_prod

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth = jnp.sum(weights * t_vals, axis=-1)
    depth = jnp.nan_to_num(depth, nan=jnp.inf)
    depth = jnp.clip(depth, jnp.min(depth), jnp.max(depth))
    acc = jnp.sum(weights, axis=-1)

    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])

    if nocs is not None:
        comp_nocs = jnp.sum(weights[..., None] * nocs, axis=-2)
        return comp_rgb, acc, weights, comp_nocs
    return comp_rgb, acc, weights, depth
