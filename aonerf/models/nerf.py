"""Hierarchical two-level NeRF field (coarse stratified -> fine PDF samples).

Reference parity: models/vanilla_nerf/model.py:123-199 (NeRF). Per level:
  coarse: 64+1 jittered stratified t-values
  fine:   128 inverse-CDF samples from coarse weights[1:-1] over bin midpoints,
          merged + sorted with the coarse t-values (=> 193 samples)
then positional encoding (deg 10 xyz / deg 4 viewdir), the level MLP,
sigmoid rgb / relu sigma (+ optional uniform sigma noise), and volumetric
integration with optional white background.
"""

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aonerf.models.mlp import NeRFMLP
from aonerf.ops import encoding, render, sampling


class NeRF(nn.Module):
    num_levels: int = 2
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    num_coarse_samples: int = 64
    num_fine_samples: int = 128
    use_viewdirs: bool = True
    noise_std: float = 0.0
    lindisp: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    # Per-ray contraction of the view-condition columns (see NeRFMLP).
    cond_dense: bool = False

    def setup(self):
        mlp_kwargs = dict(
            min_deg_point=self.min_deg_point,
            max_deg_point=self.max_deg_point,
            deg_view=self.deg_view,
            compute_dtype=self.compute_dtype,
            cond_dense=self.cond_dense,
        )
        self.coarse_mlp = NeRFMLP(**mlp_kwargs)
        self.fine_mlp = NeRFMLP(**mlp_kwargs)

    def __call__(
        self,
        rays: Dict[str, jnp.ndarray],
        randomized: bool,
        white_bkgd: bool,
        near: float,
        far: float,
        key: Optional[jax.Array] = None,
    ) -> List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """rays: dict with 'rays_o', 'rays_d' (unit), 'viewdirs' (B, 3).

        Returns [(comp_rgb, acc, depth)] per level (coarse first).
        """
        if randomized and key is None:
            raise ValueError("randomized rendering requires a PRNG key")
        keys = jax.random.split(key, self.num_levels) if key is not None else [None] * self.num_levels

        ret = []
        t_vals = None
        weights = None
        viewdirs_enc = encoding.pos_enc(rays["viewdirs"], 0, self.deg_view)
        for i_level in range(self.num_levels):
            level_key = keys[i_level]
            noise_key = None
            if level_key is not None and self.noise_std > 0:
                level_key, noise_key = jax.random.split(level_key)
            if i_level == 0:
                t_vals, samples = sampling.sample_along_rays(
                    rays_o=rays["rays_o"],
                    rays_d=rays["rays_d"],
                    num_samples=self.num_coarse_samples,
                    near=near,
                    far=far,
                    randomized=randomized,
                    lindisp=self.lindisp,
                    key=level_key,
                )
                mlp = self.coarse_mlp
            else:
                t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
                t_vals, samples = sampling.sample_pdf(
                    bins=t_mids,
                    weights=weights[..., 1:-1],
                    origins=rays["rays_o"],
                    directions=rays["rays_d"],
                    t_vals=t_vals,
                    num_samples=self.num_fine_samples,
                    randomized=randomized,
                    key=level_key,
                )
                mlp = self.fine_mlp

            samples_enc = encoding.pos_enc(samples, self.min_deg_point, self.max_deg_point)
            raw_rgb, raw_sigma = mlp(samples_enc, viewdirs_enc)

            if self.noise_std > 0 and randomized:
                raw_sigma = raw_sigma + (
                    jax.random.uniform(noise_key, raw_sigma.shape, dtype=raw_sigma.dtype)
                    * self.noise_std
                )

            rgb = nn.sigmoid(raw_rgb)
            sigma = nn.relu(raw_sigma)

            comp_rgb, acc, weights, depth = render.volumetric_rendering(
                rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd
            )
            ret.append((comp_rgb, acc, depth))
        return ret
