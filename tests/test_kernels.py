"""Tests for the Pallas fused ray-march kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from aonerf.models import NeRFMLP
from aonerf.ops import encoding, render, sampling
from aonerf.ops.kernels import fused_render_level, mlp_params_from_flax


def _setup(R=8, S=9, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (-4.0 * d).astype(np.float32)
    t_vals, coords = sampling.sample_along_rays(
        jnp.asarray(o), jnp.asarray(d), S - 1, 2.0, 6.0, False, False
    )
    xenc = encoding.pos_enc(coords, 0, 10)
    venc = encoding.pos_enc(jnp.asarray(d), 0, 4)
    mlp = NeRFMLP()
    params = mlp.init(jax.random.PRNGKey(seed), xenc, venc)
    return mlp, params, t_vals, jnp.asarray(o), jnp.asarray(d), venc, xenc


class TestFusedRender:
    def test_matches_xla_path(self):
        mlp, params, t_vals, o, d, venc, xenc = _setup()
        raw_rgb, raw_sigma = mlp.apply(params, xenc, venc)
        want = render.volumetric_rendering(
            nn.sigmoid(raw_rgb), nn.relu(raw_sigma), t_vals, d, True
        )
        kp = mlp_params_from_flax(params)
        comp, acc, depth, weights = fused_render_level(
            kp, t_vals, o, d, venc, xenc, True, ray_tile=4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(comp), np.asarray(want[0]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(acc), np.asarray(want[1]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(weights), np.asarray(want[2]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(want[3]), atol=2e-5)

    def test_black_background(self):
        mlp, params, t_vals, o, d, venc, xenc = _setup(seed=1)
        raw_rgb, raw_sigma = mlp.apply(params, xenc, venc)
        want = render.volumetric_rendering(
            nn.sigmoid(raw_rgb), nn.relu(raw_sigma), t_vals, d, False
        )
        kp = mlp_params_from_flax(params)
        comp, *_ = fused_render_level(
            kp, t_vals, o, d, venc, xenc, False, ray_tile=4, interpret=True
        )
        np.testing.assert_allclose(np.asarray(comp), np.asarray(want[0]), atol=2e-6)

    def test_rejects_nondivisible_tile(self):
        mlp, params, t_vals, o, d, venc, xenc = _setup(R=8)
        kp = mlp_params_from_flax(params)
        import pytest

        with pytest.raises(ValueError, match="ray_tile"):
            fused_render_level(kp, t_vals, o, d, venc, xenc, True, ray_tile=3, interpret=True)

    def test_weight_extraction_shapes(self):
        mlp, params, *_ = _setup()
        kp = mlp_params_from_flax(params)
        assert kp["w5x"].shape == (256, 256)
        assert kp["w5i"].shape == (63, 256)
        assert kp["wva"].shape == (256, 128)
        assert kp["wvb"].shape == (27, 128)
        assert kp["b0"].shape == (1, 256)


class TestFusedVJP:
    def test_grads_match_autodiff(self):
        """Custom-VJP fused hierarchy vs jax.grad through the flax/jnp path."""
        from aonerf.ops.kernels.fused_train import fused_nerf_forward

        rng = np.random.default_rng(0)
        R = 8
        d = rng.standard_normal((R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = (-4.0 * d).astype(np.float32)
        target = jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32))
        rays = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d), "viewdirs": jnp.asarray(d)}
        from aonerf.models import NeRF

        model = NeRF(num_coarse_samples=4, num_fine_samples=8)
        params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0)
        for m in ("coarse_mlp", "fine_mlp"):  # live gradients at init
            params["params"][m]["density"]["bias"] = (
                params["params"][m]["density"]["bias"] + 0.3
            )

        def loss_ref(p):
            out = model.apply(p, rays, False, True, 2.0, 6.0)
            return sum(jnp.mean((lvl[0] - target) ** 2) for lvl in out)

        def loss_fused(p):
            out = fused_nerf_forward(
                p, rays, True, 2.0, 6.0, key=None,
                num_coarse_samples=4, num_fine_samples=8, randomized=False,
                ray_tile_coarse=4, ray_tile_fine=4, interpret=True,
            )
            return sum(jnp.mean((lvl[0] - target) ** 2) for lvl in out)

        np.testing.assert_allclose(float(loss_ref(params)), float(loss_fused(params)), rtol=1e-5)
        g1 = jax.grad(loss_ref)(params)["params"]
        g2 = jax.grad(loss_fused)(params)["params"]
        for m in g1:
            for layer in g1[m]:
                for a in g1[m][layer]:
                    A, B = np.asarray(g1[m][layer][a]), np.asarray(g2[m][layer][a])
                    scale = np.max(np.abs(A)) + 1e-8
                    np.testing.assert_allclose(
                        B / scale, A / scale, atol=1e-4,
                        err_msg=f"{m}/{layer}/{a}",
                    )
