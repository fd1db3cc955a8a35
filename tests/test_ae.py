"""Tests for the ResNet multi-head encoder and the auto-encoder system."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aonerf.models.ae import AutoEncoderArticulatedNeRF
from aonerf.models.resnet import MultiHeadImgEncoder


class TestEncoder:
    @pytest.fixture(scope="class")
    def enc_and_params(self):
        enc = MultiHeadImgEncoder()
        x = jnp.zeros((1, 3, 64, 64))
        params = enc.init(jax.random.PRNGKey(0), x)
        return enc, params

    def test_head_shapes(self, enc_and_params):
        enc, params = enc_and_params
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
        )
        out = enc.apply(params, x)
        assert set(out) == {"color", "density", "articulation"}
        assert out["color"].shape == (2, 128)
        assert out["density"].shape == (2, 128)
        assert out["articulation"].shape == (2, 32)

    def test_heads_are_independent(self, enc_and_params):
        """Each head owns a private layer4 copy (resnet_encoder.py:121-137)."""
        enc, params = enc_and_params
        p = params["params"]
        assert "color_layer4" in p and "density_layer4" in p and "articulation_layer4" in p
        assert "layer4" not in p  # layer4 only exists per-head

    def test_multiview_aggregation(self, enc_and_params):
        enc, params = enc_and_params
        rng = np.random.default_rng(1)
        v = jnp.asarray(rng.uniform(-1, 1, (1, 3, 3, 64, 64)).astype(np.float32))
        out5 = enc.apply(params, v)
        assert out5["color"].shape == (1, 128)
        # mean aggregation == mean of per-view outputs
        per_view = [enc.apply(params, v[:, i]) for i in range(3)]
        want = np.mean([np.asarray(o["color"]) for o in per_view], axis=0)
        np.testing.assert_allclose(np.asarray(out5["color"]), want, rtol=1e-4, atol=1e-5)

    def test_instance_norm_input_scale_invariance(self, enc_and_params):
        """Instance norm after conv1 (no bias) makes the stem invariant to
        global input scaling — a sanity property of the converted backbone."""
        enc, params = enc_and_params
        x = jnp.asarray(
            np.random.default_rng(2).uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
        )
        o1 = enc.apply(params, x)
        o2 = enc.apply(params, x * 2.0)
        np.testing.assert_allclose(
            np.asarray(o1["color"]), np.asarray(o2["color"]), rtol=1e-3, atol=1e-4
        )


class TestAutoEncoderSystem:
    def _batch(self, n=16, h=48, w=64, seed=0):
        rng = np.random.default_rng(seed)
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return {
            "rays_o": jnp.asarray((-4.0 * d).astype(np.float32)),
            "rays_d": jnp.asarray(d),
            "viewdirs": jnp.asarray(d),
            "target": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
            "instance_mask": jnp.asarray(rng.uniform(size=n) > 0.5),
            "src_imgs": jnp.asarray(
                rng.uniform(-1, 1, (3, h, w)).astype(np.float32)
            ),
            "deg": jnp.asarray(np.float32(np.deg2rad(40.0))),
        }

    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = AutoEncoderArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
        batch = self._batch()
        params = model.init(
            jax.random.PRNGKey(0), batch, batch["src_imgs"][None], batch["deg"],
            False, True, 2.0, 6.0,
        )
        return model, params

    def test_forward_outputs(self, model_and_params):
        model, params = model_and_params
        batch = self._batch()
        levels, latents, pred_state = model.apply(
            params, batch, batch["src_imgs"][None], batch["deg"],
            False, True, 2.0, 6.0,
        )
        assert len(levels) == 2
        assert levels[1][0].shape == (16, 3)
        assert latents["articulation"].shape == (1, 32)
        assert pred_state.shape == (1, 1)
        assert np.all(np.isfinite(np.asarray(levels[1][0])))

    def test_deg_code_rounding_and_clipping(self, model_and_params):
        model, params = model_and_params
        code40 = model.apply(params, jnp.asarray(np.deg2rad(40.2)), method=model.deg_code)
        code40b = model.apply(params, jnp.asarray(np.deg2rad(39.8)), method=model.deg_code)
        np.testing.assert_allclose(np.asarray(code40), np.asarray(code40b), atol=1e-6)
        # out-of-range angles clamp into [0, 90]
        hi = model.apply(params, jnp.asarray(np.deg2rad(120.0)), method=model.deg_code)
        c90 = model.apply(params, jnp.asarray(np.deg2rad(90.0)), method=model.deg_code)
        np.testing.assert_allclose(np.asarray(hi), np.asarray(c90), atol=1e-6)

    def test_train_step_runs(self, model_and_params):
        from aonerf.train import create_train_state, make_adam
        from aonerf.train.step_ae import make_ae_train_step

        model, params = model_and_params
        batch = self._batch()
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0)
        state = create_train_state(params, tx)
        step = make_ae_train_step(model, tx, True, 2.0, 6.0, donate=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        for k in ("loss", "loss_state", "opacity_loss", "psnr0", "psnr1"):
            assert np.isfinite(float(metrics[k])), k
        assert int(state.step) == 1

    def _buffers(self, h=48, w=64, n_i=1, n_d=2, n_v=2, seed=3):
        rng = np.random.default_rng(seed)
        hw = h * w
        c2w = np.tile(np.eye(3, 4, dtype=np.float32), (n_i, n_d, n_v, 1, 1))
        c2w[..., 2, 3] = 4.0
        return {
            "rgb": jnp.asarray(rng.integers(0, 255, (n_i, n_d, n_v, hw, 3), dtype=np.uint8)),
            "mask": jnp.asarray(rng.integers(0, 2, (n_i, n_d, n_v, hw)).astype(np.uint8)),
            "c2w": jnp.asarray(c2w),
            "directions": jnp.asarray(rng.standard_normal((hw, 3)).astype(np.float32)),
            "deg": jnp.asarray(np.deg2rad(np.arange(n_d) * 45.0).astype(np.float32)),
        }

    def test_device_train_step_runs(self, model_and_params):
        """Fully on-device AE step (sampling + src gather + encode in one
        program), scan-fused over 2 inner steps."""
        from aonerf.train import create_train_state, make_adam
        from aonerf.train.step_ae import make_ae_device_train_step

        model, params = model_and_params
        buffers = self._buffers()
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0)
        state = create_train_state(params, tx)
        step = make_ae_device_train_step(
            model, tx, True, 2.0, 6.0, img_wh=(64, 48), batch_size=16,
            donate=False, inner_steps=2,
        )
        state, metrics = step(state, buffers, jax.random.PRNGKey(0))
        for k in ("loss", "loss_state", "opacity_loss", "psnr0", "psnr1"):
            assert np.isfinite(float(metrics[k])), k
        assert int(state.step) == 2

    def test_device_src_imgs_match_host_normalization(self):
        """sample_multi_batch(src_hw=...) must reproduce the host pipeline's
        [-1,1] (3,h,w) normalization (SapienMultiDataset.normalized_image)."""
        from aonerf.train.step import sample_multi_batch

        h, w = 6, 8
        buffers = self._buffers(h=h, w=w, n_i=1, n_d=1, n_v=1)
        batch = sample_multi_batch(buffers, jax.random.PRNGKey(1), 4, src_hw=(h, w))
        rgb = np.asarray(buffers["rgb"][0, 0, 0]).reshape(h, w, 3)
        want = np.moveaxis((rgb.astype(np.float32) / 255.0 - 0.5) / 0.5, -1, 0)
        np.testing.assert_allclose(np.asarray(batch["src_imgs"]), want, atol=1e-6)


class TestSpatialHeads:
    def test_pixel_aligned_color_head(self):
        enc = MultiHeadImgEncoder(spatials=("color",), art_size=0, density_size=0)
        x = jnp.zeros((1, 3, 64, 64))
        params = enc.init(jax.random.PRNGKey(0), x)
        out = enc.apply(params, x)
        # pixel-aligned head: (B, C, H/2, W/2); vector heads unaffected
        assert out["color"].shape == (1, 128, 32, 32)

    def test_spatial_multiview_agg(self):
        enc = MultiHeadImgEncoder(spatials=("density",), art_size=0, color_size=0)
        x = jnp.zeros((1, 2, 3, 32, 32))
        params = enc.init(jax.random.PRNGKey(0), x[:, 0])
        out = enc.apply(params, x)
        assert out["density"].shape == (1, 128, 16, 16)
