"""Articulated NeRF: latent-conditioned field with a deformation MLP warp.

Reference parity: models/vanilla_nerf/model_autodecoder.py:60-337
(NeRFMLP, NeRF_AE_Art). Per sample point:
  1. deformation MLP (4x128): cat(xyz, shape_code, articulation_code) -> dxyz;
     canonical point = xyz + dxyz (the articulation warp)
  2. positional encoding of the warped point (``enc_after=True`` default),
     concatenated with the shape code -> 8x256 trunk (skip concat at layer 4)
  3. view branch (4x128): cat(bottleneck, viewdir enc, appearance code) -> rgb
  4. sigma = softplus(raw + density_bias=-1); rgb = sigmoid(raw) stretched by
     rgb_padding=0.001
The two-level hierarchy (coarse/fine PDF resampling) matches the vanilla NeRF.
"""

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aonerf.models.mlp import fused_density_bottleneck
from aonerf.ops import encoding, render, sampling

_XAVIER = nn.initializers.xavier_uniform()


def _broadcast_latent(latent: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Broadcast a latent of shape (C,), (1, C), or (B, C) to (n_rows, C).

    The reference repeats a single (1, C) embedding across all rays*samples
    (model_autodecoder.py:186-194); (B, C) per-ray latents tile over samples.
    """
    latent = jnp.atleast_2d(latent)
    b, c = latent.shape
    if b == 1:
        return jnp.broadcast_to(latent, (n_rows, c))
    if n_rows % b != 0:
        raise ValueError(f"latent batch {b} does not divide rows {n_rows}")
    return jnp.repeat(latent, n_rows // b, axis=0)


def _latent_dense(
    mod: nn.Module,
    name: str,
    out_dim: int,
    x_var: jnp.ndarray,
    latents_small: List[jnp.ndarray],
    n_rows: int,
    compute_dtype,
    bias_init: float = 0.0,
) -> jnp.ndarray:
    """Dense over concat(x_var, *broadcast(latents)) WITHOUT materializing the
    broadcast: y = x_var @ K[:v] + b + sum_i broadcast(small_i @ K[slice_i]).

    The latent codes are constant per view (reference repeats one (1, C)
    embedding across all rays*samples, model_autodecoder.py:186-194), so
    their kernel columns can be contracted once on the (V, C) rows and the
    (V, out) result broadcast-added — the per-sample matmul K dim drops by
    the latent width (163->3 on the deformation input, 191->63 on the trunk
    input, 447->319 on the skip layer, 411->283 on the view branch) and the
    n_rows x C latent tiles are never built. Each latent broadcasts
    independently, so mixed leading dims compose (e.g. the view branch adds
    a per-RAY viewdir contribution and a per-VIEW appearance contribution).
    The kernel keeps the exact concat layout and shape of the reference's
    Linear, so the param pytree is identical to the nn.Dense path
    (checkpoints interchange either direction) and each output is the same
    dot product (float-associativity differences only). One non-equivalence:
    FRESH INITS from the same seed draw different values (Flax folds the RNG
    per param path, and this is one param where nn.Dense has a submodule) —
    same xavier distribution, different sample; irrelevant once params are
    loaded or trained."""
    var_dim = x_var.shape[-1]
    lat_dim = sum(jnp.atleast_2d(l).shape[-1] for l in latents_small)

    def init(key):
        return {
            "kernel": _XAVIER(key, (var_dim + lat_dim, out_dim), jnp.float32),
            "bias": jnp.full((out_dim,), bias_init, jnp.float32),
        }

    p = mod.param(name, init)
    k = p["kernel"].astype(compute_dtype)
    y = x_var @ k[:var_dim] + p["bias"].astype(compute_dtype)
    off = var_dim
    for lat in latents_small:
        lat = jnp.atleast_2d(lat).astype(compute_dtype)
        d = lat.shape[-1]
        y = y + _broadcast_latent(lat @ k[off:off + d], n_rows)
        off += d
    return y


class ArticulatedNeRFMLP(nn.Module):
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    netdepth: int = 8
    netwidth: int = 256
    netdepth_deformation: int = 4
    netwidth_deformation: int = 128
    netdepth_condition: int = 4
    netwidth_condition: int = 128
    shape_latent_dim: int = 128
    appearance_latent_dim: int = 128
    articulation_latent_dim: int = 32
    skip_layer: int = 4
    input_ch: int = 3
    input_ch_view: int = 3
    num_rgb_channels: int = 3
    num_density_channels: int = 1
    deformation_mlp: bool = True
    enc_after: bool = True
    embed_deg: bool = False
    # Positive density-head bias to avoid a relu-dead start (see mlp.py);
    # only used by the relu-sigma (AE) variant — softplus has live gradients.
    density_bias_init: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    # One matmul for density+bottleneck (see mlp.fused_density_bottleneck).
    fused_head: bool = False
    # Contract latent kernel columns once per view instead of materializing
    # rows x C latent broadcasts (see _latent_dense): the per-sample matmul
    # K dims drop 163->3 (deform_0), 191->63 (trunk), 447->319 (skip),
    # 411->256 (view branch, whose per-ray viewdir condition is also
    # contracted per ray). Same param pytree and math as the concat path
    # (equivalence pinned in tests/test_models.py); flag only selects the
    # compute schedule.
    latent_dense: bool = False

    def _dense(self, feats: int, name: str, bias_init: float = 0.0) -> nn.Dense:
        return nn.Dense(
            feats,
            kernel_init=_XAVIER,
            bias_init=nn.initializers.constant(bias_init),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        pos: jnp.ndarray,
        condition: jnp.ndarray,
        latents: Dict[str, jnp.ndarray],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pos: (B, S, 3) raw points when enc_after else (B, S, pos_enc_dim);
        condition: (B, view_enc_dim); latents: dict of codes.

        Returns (raw_rgb (B, S, 3), raw_density (B, S, 1)).
        """
        shape_code = latents["density"]
        appearance_code = latents["color"]
        if self.embed_deg:
            articulation_code = latents["articulation_deg"]
        else:
            articulation_code = latents["articulation"]

        num_rays, num_samples, feat_dim = pos.shape
        n_rows = num_rays * num_samples
        pos = pos.reshape(n_rows, feat_dim).astype(self.compute_dtype)

        if self.latent_dense:
            # Latents stay at their small (V, C) shapes; every layer that
            # consumes them contracts their kernel columns on those rows and
            # broadcast-adds (see _latent_dense). Layer names, kernel layouts
            # and the math are identical to the concat path below.
            if (self.netdepth - 1) % self.skip_layer == 0 and self.netdepth > 1:
                raise ValueError(
                    "latent_dense does not support a skip concat after the "
                    "final trunk layer (netdepth-1 divisible by skip_layer): "
                    "the heads would consume a latent-augmented input. Use "
                    "latent_dense=False for this depth."
                )
            trunk_latents = [shape_code]
            if self.deformation_mlp:
                x = nn.relu(_latent_dense(
                    self, "deform_0", self.netwidth_deformation, pos,
                    [shape_code, articulation_code], n_rows, self.compute_dtype,
                ))
                for idx in range(1, self.netdepth_deformation):
                    x = nn.relu(
                        self._dense(self.netwidth_deformation, f"deform_{idx}")(x)
                    )
                delta_dim = self.input_ch if self.enc_after else feat_dim
                x = self._dense(delta_dim, "deform_out")(x) + pos
                if self.enc_after:
                    x = encoding.pos_enc(x, self.min_deg_point, self.max_deg_point)
                var_inputs = x  # row-varying slice of the trunk skip input
            else:
                var_inputs = pos
                trunk_latents = [shape_code, articulation_code]
            x = None
            for idx in range(self.netdepth):
                if idx == 0:
                    h = _latent_dense(
                        self, "pts_0", self.netwidth, var_inputs,
                        trunk_latents, n_rows, self.compute_dtype,
                    )
                elif (idx - 1) % self.skip_layer == 0 and idx - 1 > 0:
                    # the concat path appended `inputs` after layer idx-1
                    h = _latent_dense(
                        self, f"pts_{idx}", self.netwidth,
                        jnp.concatenate([x, var_inputs], axis=-1),
                        trunk_latents, n_rows, self.compute_dtype,
                    )
                else:
                    h = self._dense(self.netwidth, f"pts_{idx}")(x)
                x = nn.relu(h)
        else:
            shape_b = _broadcast_latent(shape_code, n_rows).astype(self.compute_dtype)
            articulation_b = _broadcast_latent(articulation_code, n_rows).astype(
                self.compute_dtype
            )

            x = jnp.concatenate([pos, shape_b, articulation_b], axis=-1)

            if self.deformation_mlp:
                for idx in range(self.netdepth_deformation):
                    x = self._dense(self.netwidth_deformation, f"deform_{idx}")(x)
                    x = nn.relu(x)
                delta_dim = self.input_ch if self.enc_after else feat_dim
                x = self._dense(delta_dim, "deform_out")(x) + pos
                if self.enc_after:
                    x = encoding.pos_enc(x, self.min_deg_point, self.max_deg_point)
                x = jnp.concatenate([x, shape_b], axis=-1)

            inputs = x
            for idx in range(self.netdepth):
                x = self._dense(self.netwidth, f"pts_{idx}")(x)
                x = nn.relu(x)
                if idx % self.skip_layer == 0 and idx > 0:
                    x = jnp.concatenate([x, inputs], axis=-1)

        if self.fused_head:
            raw_density, bottleneck = fused_density_bottleneck(
                self, x, self.num_density_channels, self.netwidth,
                self.density_bias_init, self.compute_dtype,
            )
        else:
            raw_density = self._dense(
                self.num_density_channels, "density", bias_init=self.density_bias_init
            )(x)
            bottleneck = self._dense(self.netwidth, "bottleneck")(x)
        raw_density = raw_density.reshape(num_rays, num_samples, self.num_density_channels)
        condition = condition.astype(self.compute_dtype)
        if self.latent_dense:
            # The per-ray viewdir condition and the per-view appearance code
            # both broadcast over samples/rays: contract their kernel columns
            # on (B, 27) and (V, 128) rows instead of tiling to n_rows.
            x = nn.relu(_latent_dense(
                self, "views_0", self.netwidth_condition, bottleneck,
                [condition, appearance_code], n_rows, self.compute_dtype,
            ))
            for idx in range(1, self.netdepth_condition):
                x = nn.relu(
                    self._dense(self.netwidth_condition, f"views_{idx}")(x)
                )
        else:
            condition_tile = jnp.repeat(
                condition[:, None, :], num_samples, axis=1
            ).reshape(n_rows, condition.shape[-1])
            appearance_b = _broadcast_latent(appearance_code, n_rows).astype(
                self.compute_dtype
            )
            x = jnp.concatenate([bottleneck, condition_tile, appearance_b], axis=-1)
            for idx in range(self.netdepth_condition):
                x = self._dense(self.netwidth_condition, f"views_{idx}")(x)
                x = nn.relu(x)

        raw_rgb = self._dense(self.num_rgb_channels, "rgb")(x)
        raw_rgb = raw_rgb.reshape(num_rays, num_samples, self.num_rgb_channels)
        return raw_rgb.astype(jnp.float32), raw_density.astype(jnp.float32)


class ArticulatedNeRF(nn.Module):
    """Two-level articulated field (reference NeRF_AE_Art, model_autodecoder.py:242-337)."""

    num_levels: int = 2
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    num_coarse_samples: int = 64
    num_fine_samples: int = 128
    use_viewdirs: bool = True
    noise_std: float = 0.0
    lindisp: bool = False
    rgb_padding: float = 0.001
    density_bias: float = -1.0
    sigma_activation: str = "softplus"  # 'softplus' (autodecoder) | 'relu' (AE)
    # Optional soft density cap (None = unbounded, reference parity); see the
    # tanh cap in __call__. The AE system sets this — its jointly-trained
    # encoder drives σ into f32 alpha saturation without it.
    sigma_cap: Optional[float] = None
    # Treat the final sample as background instead of field content. The
    # integrator gives the last sample an infinite extent (reference
    # helper.py:163: dists[-1] = 1e10) so it absorbs all leftover
    # transmittance — correct for a relu density field (exact zeros in empty
    # space) but degenerate for softplus (density never exactly 0): the
    # full-ray acc is pinned at 1.0 on every ray (an opacity loss on it has
    # zero gradient forever) and the background is painted with the tail
    # sample's unsupervised color rather than the white background (measured,
    # RESULTS.md). With this flag the tail's transmittance share goes to the
    # background color and the reported acc excludes the tail weight: acc ~ 1
    # where a surface absorbs the ray, ~ Σσδ ≈ 0 in empty space — a
    # reachable opacity target, and bg pixels render the true background.
    tail_to_background: bool = False
    enc_after: bool = True
    embed_deg: bool = False
    compute_dtype: jnp.dtype = jnp.float32
    # Contract latent kernel columns per view instead of broadcasting codes
    # to rays x samples rows (see ArticulatedNeRFMLP.latent_dense).
    latent_dense: bool = False

    def setup(self):
        mlp_kwargs = dict(
            min_deg_point=self.min_deg_point,
            max_deg_point=self.max_deg_point,
            deg_view=self.deg_view,
            enc_after=self.enc_after,
            embed_deg=self.embed_deg,
            # relu sigma needs a live start; softplus does not (see mlp.py)
            density_bias_init=0.3 if self.sigma_activation == "relu" else 0.0,
            compute_dtype=self.compute_dtype,
            latent_dense=self.latent_dense,
        )
        self.coarse_mlp = ArticulatedNeRFMLP(**mlp_kwargs)
        self.fine_mlp = ArticulatedNeRFMLP(**mlp_kwargs)

    def __call__(
        self,
        rays: Dict[str, jnp.ndarray],
        randomized: bool,
        white_bkgd: bool,
        near: float,
        far: float,
        latents: Dict[str, jnp.ndarray],
        key: Optional[jax.Array] = None,
    ) -> List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
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

            if self.enc_after:
                samples_enc = samples  # warped inside the MLP, encoded after
            else:
                samples_enc = encoding.pos_enc(
                    samples, self.min_deg_point, self.max_deg_point
                )
            raw_rgb, raw_sigma = mlp(samples_enc, viewdirs_enc, latents)

            if self.noise_std > 0 and randomized:
                raw_sigma = raw_sigma + (
                    jax.random.uniform(noise_key, raw_sigma.shape, dtype=raw_sigma.dtype)
                    * self.noise_std
                )

            rgb = nn.sigmoid(raw_rgb)
            rgb = rgb * (1.0 + 2.0 * self.rgb_padding) - self.rgb_padding
            if self.sigma_activation == "softplus":
                sigma = nn.softplus(raw_sigma + self.density_bias)
            else:  # AE variant: plain relu, no bias (model_ae_art.py:233,292)
                sigma = nn.relu(raw_sigma)
            if self.sigma_cap is not None:
                # Soft density cap: sigma = cap·tanh(sigma/cap) ≈ identity
                # below ~cap/2, saturating at cap. Prevents the f32 dead zone
                # where alpha = 1-exp(-σδ) rounds to 1 exactly and ALL
                # gradients through the transmittance underflow to zero —
                # measured on the AE run: a runaway σ saturates acc to 1.0 on
                # every ray within ~2k steps and freezes the haze forever
                # (RESULTS.md). cap=500 over the [2,6] scene (δ≈0.02) still
                # allows alpha≈0.9999 — visually fully opaque.
                sigma = self.sigma_cap * jnp.tanh(sigma / self.sigma_cap)

            comp_rgb, acc, weights, depth = render.volumetric_rendering(
                rgb, sigma, t_vals, rays["rays_d"], white_bkgd=white_bkgd
            )
            if self.tail_to_background:
                w_last = weights[..., -1]
                # comp = Σ_{i<N} w_i·rgb_i + (1 − acc_excl)·bg; equivalently
                # move the tail term from field color to background color.
                bg = 1.0 if white_bkgd else 0.0
                comp_rgb = comp_rgb + w_last[..., None] * (bg - rgb[..., -1, :])
                acc = acc - w_last
            ret.append((comp_rgb, acc, depth))
        return ret
