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

    def test_embed_deg_false_uses_raw_articulation_code(self):
        """The reference's embed_deg=False branch (model_ae_art.py:224): the
        encoder's raw articulation code conditions the deformation MLP — no
        deg-embedding table exists, and changing ``deg`` does not change the
        render (only the state loss sees it)."""
        model = AutoEncoderArticulatedNeRF(
            num_coarse_samples=4, num_fine_samples=4, embed_deg=False
        )
        batch = self._batch()
        params = model.init(
            jax.random.PRNGKey(0), batch, batch["src_imgs"][None], batch["deg"],
            False, True, 2.0, 6.0,
        )
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        assert not any("deg_embedding" in str(p) for p, _ in flat)
        out40 = model.apply(
            params, batch, batch["src_imgs"][None], jnp.asarray(np.deg2rad(40.0)),
            False, True, 2.0, 6.0,
        )
        out80 = model.apply(
            params, batch, batch["src_imgs"][None], jnp.asarray(np.deg2rad(80.0)),
            False, True, 2.0, 6.0,
        )
        np.testing.assert_allclose(
            np.asarray(out40[0][1][0]), np.asarray(out80[0][1][0]), atol=1e-6
        )
        assert np.all(np.isfinite(np.asarray(out40[0][1][0])))

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

    def test_multiview_batch_must_divide(self, model_and_params):
        """views_per_step that does not divide batch_size would silently drop
        rays (batch_size // n_views per view) — must fail at build time."""
        from aonerf.train import make_adam
        from aonerf.train.step_ae import make_ae_device_train_step

        model, _ = model_and_params
        with pytest.raises(ValueError, match="divisible by views_per_step"):
            make_ae_device_train_step(
                model, make_adam(), True, 2.0, 6.0, img_wh=(64, 48),
                batch_size=16, views_per_step=3,
            )

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


class TestTorchWeightGraft:
    """init_from_torch_state_dict with a SYNTHETIC torch-layout state dict
    (no torch needed): every torchvision ResNet34 conv key must be consumed,
    transposed OIHW->HWIO, and grafted into the shared stages AND each
    head's private layer4 copy (reference resnet_encoder.py:85,311)."""

    @staticmethod
    def _fake_resnet34_state_dict():
        """All conv weights of torchvision resnet34, each filled with a
        unique value so destination leaves identify their source."""
        blocks = (3, 4, 6, 3)
        widths = (64, 128, 256, 512)
        sd = {}
        val = [1.0]

        def add(key, shape):
            sd[key] = np.full(shape, val[0], np.float32)
            val[0] += 1.0

        add("conv1.weight", (64, 3, 7, 7))
        in_w = 64
        for si, (n, w) in enumerate(zip(blocks, widths)):
            for b in range(n):
                cin = in_w if b == 0 else w
                add(f"layer{si+1}.{b}.conv1.weight", (w, cin, 3, 3))
                add(f"layer{si+1}.{b}.conv2.weight", (w, w, 3, 3))
                if b == 0 and si > 0:
                    add(f"layer{si+1}.{b}.downsample.0.weight", (w, in_w, 1, 1))
            in_w = w
        return sd

    def test_graft_consumes_all_keys_and_transposes(self):
        from aonerf.models.resnet import MultiHeadImgEncoder, init_from_torch_state_dict

        enc = MultiHeadImgEncoder(global_size=64)  # all four heads
        params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))

        sd = self._fake_resnet34_state_dict()
        accessed = set()

        class Tracking(dict):
            def __getitem__(self, k):
                accessed.add(k)
                return dict.__getitem__(self, k)

        out = init_from_torch_state_dict(params, Tracking(sd))

        # every key consumed: a typo'd prefix or a silently-skipped head
        # would leave keys unread
        assert accessed == set(sd), sorted(set(sd) - accessed)

        p = out["params"]
        # OIHW -> HWIO transpose on the stem
        np.testing.assert_array_equal(
            np.asarray(p["conv1"]["kernel"]),
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
        )
        assert p["conv1"]["kernel"].shape == (7, 7, 3, 64)
        # a mid-stage block with downsample
        np.testing.assert_array_equal(
            np.asarray(p["layer2"]["block0"]["downsample"]["kernel"]),
            np.transpose(sd["layer2.0.downsample.0.weight"], (2, 3, 1, 0)),
        )
        # all four heads carry the SAME torch layer4 weights in their
        # private copies
        for head in ("global", "color", "density", "articulation"):
            np.testing.assert_array_equal(
                np.asarray(p[f"{head}_layer4"]["block1"]["conv2"]["kernel"]),
                np.transpose(sd["layer4.1.conv2.weight"], (2, 3, 1, 0)),
            )
        # untouched leaves (head fc) keep their init values
        np.testing.assert_array_equal(
            np.asarray(out["params"]["color_fc"]["kernel"]),
            np.asarray(params["params"]["color_fc"]["kernel"]),
        )

    def test_graft_forward_still_runs(self):
        from aonerf.models.resnet import MultiHeadImgEncoder, init_from_torch_state_dict

        enc = MultiHeadImgEncoder()
        params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64)))
        sd = self._fake_resnet34_state_dict()
        out_params = init_from_torch_state_dict(params, sd)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
        )
        out = enc.apply(out_params, x)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in out.values())


class TestMultiViewAEStep:
    def _buffers2(self, h=12, w=16, n_i=2, n_d=2, n_v=2, seed=7):
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

    def test_multiview_sampler_groups_by_view(self):
        """Each view's ray slice must come from ITS image: ray group v's
        targets are pixels of the view whose src_imgs[v] is emitted."""
        from aonerf.train.step import sample_multi_batch_multiview

        h, w = 12, 16
        buffers = self._buffers2(h=h, w=w)
        V, B = 4, 32
        batch = sample_multi_batch_multiview(
            buffers, jax.random.PRNGKey(3), B, V, src_hw=(h, w)
        )
        assert batch["src_imgs"].shape == (V, 3, h, w)
        assert batch["deg"].shape == (V,)
        assert batch["rays_o"].shape == (B, 3)
        per = B // V
        for v in range(V):
            ii = int(batch["instance_id"][v])
            di = int(batch["articulation_id"][v])
            # the group's target pixels must exist in one of this
            # (instance, articulation)'s views
            grp = np.asarray(batch["target"][v * per : (v + 1) * per])
            imgs = np.asarray(buffers["rgb"][ii, di]).astype(np.float32) / 255.0
            found = any(
                all(
                    (np.abs(imgs[vi] - px).sum(axis=-1) < 1e-6).any()
                    for px in grp[:4]
                )
                for vi in range(imgs.shape[0])
            )
            assert found, f"group {v} pixels not found in its sampled view"

    def test_multiview_ae_step_runs(self):
        from aonerf.train import create_train_state, make_adam
        from aonerf.train.step import sample_multi_batch_multiview
        from aonerf.train.step_ae import make_ae_device_train_step

        h, w = 12, 16
        model = AutoEncoderArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
        buffers = self._buffers2(h=h, w=w)
        dummy = sample_multi_batch_multiview(
            buffers, jax.random.PRNGKey(0), 16, 2, src_hw=(h, w)
        )
        params = model.init(
            jax.random.PRNGKey(0), dummy, dummy["src_imgs"], dummy["deg"],
            False, True, 2.0, 6.0,
        )
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0)
        state = create_train_state(params, tx)
        step = make_ae_device_train_step(
            model, tx, True, 2.0, 6.0, img_wh=(w, h), batch_size=16,
            donate=False, inner_steps=2, views_per_step=2,
        )
        state, metrics = step(state, buffers, jax.random.PRNGKey(0))
        for k in ("loss", "loss_state", "opacity_loss", "psnr0", "psnr1"):
            assert np.isfinite(float(metrics[k])), k
        assert int(state.step) == 2
