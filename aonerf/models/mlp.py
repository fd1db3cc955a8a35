"""Vanilla NeRF MLP: 8x256 trunk with skip, view-conditioned rgb branch.

Reference parity: models/vanilla_nerf/model.py:39-120 (NeRFMLP). Architecture:
  - trunk: Dense(pos->256) + 7x Dense(256->256), ReLU, with the positional
    input concatenated to the activations after trunk layer index 4
    (so layer 5 consumes 256+pos features)
  - density head: Dense(256->1) on the trunk output
  - bottleneck: Dense(256->256); concat with tiled view encoding
  - view branch: netdepth_condition x Dense(->128), ReLU; rgb: Dense(128->3)

All matmuls are batched (rays*samples, features) so XLA maps them onto the
MXU; ``compute_dtype=bfloat16`` runs the matmuls in bf16 with fp32 params.
"""

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from aonerf.ops.encoding import pos_enc_dim

_XAVIER = nn.initializers.xavier_uniform()


def fused_density_bottleneck(
    mod: nn.Module,
    x: jnp.ndarray,
    num_density_channels: int,
    netwidth: int,
    density_bias_init: float,
    compute_dtype,
):
    """Density (N=1) + bottleneck (N=256) heads as ONE matmul.

    Two separate trunk-head matmuls leave the MXU idle on the N=1 density
    column (measured -7.6% fine-level fwd+bwd on v5e when fused). Kernels are
    concatenated at APPLY time: the param tree keeps the reference layout
    ({density,bottleneck}/{kernel,bias}, model.py:75-77) and each fused
    output column is the same independent dot product, so outputs match the
    unfused form. Returns (raw_density, bottleneck), un-reshaped.
    """
    trunk_dim = x.shape[-1]

    def _dense_init(out_dim, bias_init):
        def init(key):
            return {
                "kernel": _XAVIER(key, (trunk_dim, out_dim), jnp.float32),
                "bias": jnp.full((out_dim,), bias_init, jnp.float32),
            }

        return init

    dens_p = mod.param("density", _dense_init(num_density_channels, density_bias_init))
    bott_p = mod.param("bottleneck", _dense_init(netwidth, 0.0))
    head_k = jnp.concatenate([dens_p["kernel"], bott_p["kernel"]], axis=1)
    head_b = jnp.concatenate([dens_p["bias"], bott_p["bias"]])
    head = x @ head_k.astype(compute_dtype) + head_b.astype(compute_dtype)
    return head[..., :num_density_channels], head[..., num_density_channels:]


class NeRFMLP(nn.Module):
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    netdepth: int = 8
    netwidth: int = 256
    netdepth_condition: int = 1
    netwidth_condition: int = 128
    skip_layer: int = 4
    input_ch: int = 3
    input_ch_view: int = 3
    num_rgb_channels: int = 3
    num_density_channels: int = 1
    # The reference's symmetric init can start with relu(sigma) == 0 for every
    # sample (zero gradient, glacial start — observed empirically: train-view
    # PSNR 14.4 vs 34.0 after 400 steps). A small positive density-head bias
    # guarantees live gradients at init; set 0.0 for init-parity experiments.
    density_bias_init: float = 0.3
    compute_dtype: jnp.dtype = jnp.float32
    # Fused density+bottleneck head (see fused_density_bottleneck). Off by
    # default: it wins 7.6% on the MLP in isolation (v5e) but LOSES ~3% on
    # the full train step — XLA schedules the composed program worse with
    # the pre-fused matmul. Outputs are identical either way; the flag is an
    # escape hatch for future toolchains where the tradeoff may flip.
    fused_head: bool = False
    # Contract the view-condition kernel columns of views_0 on the (B, 27)
    # per-RAY rows and broadcast-add over samples, instead of tiling the
    # condition to (B*S, 27) and widening the matmul K 256->283 — the same
    # schedule idea as the articulated latent_dense (articulated.py), where
    # it wins +20%. Here it LOSES ~1% on the full train step (121.3K vs
    # 122.6K rays/s, RESULTS.md): the vanilla condition is only 27 columns
    # (vs 128-288 latent columns), so the FLOP savings are ~1.7% and XLA's
    # schedule disturbance eats them. Off by default; param pytree and math
    # identical either way (tests/test_models.py).
    cond_dense: bool = False

    def _dense(self, feats: int, name: str, bias_init: float = 0.0) -> nn.Dense:
        return nn.Dense(
            feats,
            kernel_init=_XAVIER,
            bias_init=nn.initializers.constant(bias_init),
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    @property
    def pos_size(self) -> int:
        return pos_enc_dim(self.input_ch, self.min_deg_point, self.max_deg_point)

    @property
    def view_pos_size(self) -> int:
        return pos_enc_dim(self.input_ch_view, 0, self.deg_view)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, condition: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, S, pos_size) encoded samples; condition: (B, view_pos_size).

        Returns (raw_rgb (B, S, 3), raw_density (B, S, 1)).
        """
        num_samples, feat_dim = x.shape[1:]
        x = x.reshape(-1, feat_dim).astype(self.compute_dtype)
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
        raw_density = raw_density.reshape(-1, num_samples, self.num_density_channels)
        condition = condition.astype(self.compute_dtype)
        if self.cond_dense:
            var_dim = bottleneck.shape[-1]
            cond_dim = condition.shape[-1]

            def init(key):
                return {
                    "kernel": _XAVIER(
                        key, (var_dim + cond_dim, self.netwidth_condition),
                        jnp.float32,
                    ),
                    "bias": jnp.zeros((self.netwidth_condition,), jnp.float32),
                }

            p = self.param("views_0", init)
            k = p["kernel"].astype(self.compute_dtype)
            contrib = condition @ k[var_dim:]  # (B, width) once per ray
            x = nn.relu(
                bottleneck @ k[:var_dim]
                + p["bias"].astype(self.compute_dtype)
                + jnp.repeat(contrib, num_samples, axis=0)
            )
            for idx in range(1, self.netdepth_condition):
                x = nn.relu(self._dense(self.netwidth_condition, f"views_{idx}")(x))
        else:
            condition_tile = jnp.repeat(
                condition[:, None, :], num_samples, axis=1
            ).reshape(-1, condition.shape[-1])
            x = jnp.concatenate([bottleneck, condition_tile], axis=-1)
            for idx in range(self.netdepth_condition):
                x = self._dense(self.netwidth_condition, f"views_{idx}")(x)
                x = nn.relu(x)

        raw_rgb = self._dense(self.num_rgb_channels, "rgb")(x)
        raw_rgb = raw_rgb.reshape(-1, num_samples, self.num_rgb_channels)
        return raw_rgb.astype(jnp.float32), raw_density.astype(jnp.float32)
