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


class TestEncodeReuse:
    """encode_reuse R: groups of R optimizer steps share one sampled view —
    step 1 full (encoder fwd+bwd), steps 2..R field-only on the detached
    step-1 latents. Pinned against a manual single-step replay."""

    def _setup(self, h=12, w=16):
        from tests.test_parallel import _multi_buffers

        model = AutoEncoderArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
        buffers = _multi_buffers(h=h, w=w, n_v=4)
        from aonerf.train.step import sample_multi_batch

        dummy = sample_multi_batch(buffers, jax.random.PRNGKey(0), 8, src_hw=(h, w))
        params = model.init(
            jax.random.PRNGKey(0), dummy, dummy["src_imgs"][None], dummy["deg"],
            False, True, 2.0, 6.0,
        )
        return model, buffers, params, (h, w)

    def test_view_pixel_samplers_match_multibatch_math(self):
        """sample_view + sample_view_pixels produce the same ray/target
        construction as sample_multi_batch (unit viewdirs, origin at camera
        center, [0,1] targets, [-1,1] src image)."""
        from tests.test_parallel import _multi_buffers
        from aonerf.train.step import sample_view, sample_view_pixels, view_src_image

        h, w = 12, 16
        buffers = _multi_buffers(h=h, w=w, n_v=4)
        view = sample_view(buffers, jax.random.PRNGKey(3))
        batch = sample_view_pixels(view, buffers["directions"], jax.random.PRNGKey(4), 32)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(batch["viewdirs"]), axis=-1), 1.0, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(batch["rays_o"]),
            np.broadcast_to(np.asarray(view["c2w"])[:, 3], (32, 3)),
        )
        assert float(batch["target"].min()) >= 0.0 and float(batch["target"].max()) <= 1.0
        src = np.asarray(view_src_image(view, (h, w)))
        assert src.shape == (3, h, w) and src.min() >= -1.0 and src.max() <= 1.0
        # src pixel (c, y, x) is the [-1,1]-normalized view pixel y*w+x
        flat = np.asarray(view["rgb"]).astype(np.float32) / 255.0 * 2.0 - 1.0
        np.testing.assert_allclose(src[:, 3, 5], flat[3 * w + 5], atol=1e-6)

    def test_group_matches_manual_replay(self):
        """R=2 group == manual (full step; field-only step) replay with the
        same PRNG stream: identical params after the group, and the compiled
        program contains ONE encoder forward per group, not two (the point
        of the lever)."""
        import optax

        from aonerf.train import create_train_state
        from aonerf.train.step import sample_view, sample_view_pixels, view_src_image
        from aonerf.train.step_ae import (
            _ae_field_loss_fn,
            _ae_loss_fn,
            make_ae_device_train_step,
        )

        model, buffers, params, (h, w) = self._setup()
        tx = optax.sgd(1e-2)
        base_key = jax.random.PRNGKey(21)
        R, B = 2, 8

        step = make_ae_device_train_step(
            model, tx, True, 2.0, 6.0, img_wh=(w, h), batch_size=B,
            donate=False, inner_steps=R, encode_reuse=R,
        )
        state0 = create_train_state(params, tx)
        state1, metrics = step(state0, buffers, base_key)
        assert int(state1.step) == R
        assert np.isfinite(float(metrics["loss"]))

        # manual replay — JITTED wholesale so the comparison is
        # compilation-to-compilation (eager CPU numerics drift ~1e-3 through
        # the encoder+render grads; the jitted replay matches the group
        # step BIT-EXACTLY, which is the strongest possible equivalence)
        full_loss = _ae_loss_fn(model, True, 2.0, 6.0, True, 0.5,
                                return_latents=True)
        field_loss = _ae_field_loss_fn(model, True, 2.0, 6.0, True, 0.5)

        def manual(p, buffers, base_key):
            opt = tx.init(p)
            # step 0: full
            k = jax.random.fold_in(base_key, 0)
            sample_key, render_key = jax.random.split(k)
            k_view, k_pix = jax.random.split(sample_key)
            view = sample_view(buffers, k_view)
            batch = sample_view_pixels(view, buffers["directions"], k_pix, B)
            batch["src_imgs"] = view_src_image(view, (h, w))
            (_, (_, _, ls, _, latents)), grads = jax.value_and_grad(
                full_loss, has_aux=True
            )(p, batch, render_key)
            up, opt = tx.update(grads, opt, p)
            p = optax.apply_updates(p, up)
            # step 1: field-only, same view, cached latents
            k = jax.random.fold_in(base_key, 1)
            s_key, r_key = jax.random.split(k)
            b = sample_view_pixels(view, buffers["directions"], s_key, B)
            (_, _), g = jax.value_and_grad(field_loss, has_aux=True)(
                p, b, latents, r_key
            )
            up, opt = tx.update(g, opt, p)
            return optax.apply_updates(p, up), ls

        want, ls = jax.jit(manual)(params, buffers, base_key)
        np.testing.assert_allclose(float(metrics["loss_state"]), float(ls), rtol=1e-5)
        for a, b_ in zip(
            jax.tree_util.tree_leaves(state1.params), jax.tree_util.tree_leaves(want)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-7)

        # one encoder conv forward per R-step group (the reuse), i.e. the
        # compiled HLO of the 2-step group holds the same number of
        # encoder-stem convolutions as ONE full step, not two
        hlo2 = step.lower(state0, buffers, base_key).compile().as_text()
        step1 = make_ae_device_train_step(
            model, tx, True, 2.0, 6.0, img_wh=(w, h), batch_size=B,
            donate=False, inner_steps=1, encode_reuse=1,
        )
        hlo1 = step1.lower(state0, buffers, base_key).compile().as_text()
        assert hlo2.count("convolution") <= hlo1.count("convolution")

    def test_field_only_steps_leave_encoder_untouched(self):
        import optax

        from aonerf.train import create_train_state
        from aonerf.train.step_ae import make_ae_device_train_step

        model, buffers, params, (h, w) = self._setup()
        tx = optax.sgd(1e-2)
        R = 4
        step = make_ae_device_train_step(
            model, tx, True, 2.0, 6.0, img_wh=(w, h), batch_size=8,
            donate=False, inner_steps=R, encode_reuse=R,
        )
        state0 = create_train_state(params, tx)
        state1, _ = step(state0, buffers, jax.random.PRNGKey(5))
        assert int(state1.step) == R
        # encoder params moved exactly once (SGD: p1 = p0 - lr*g_full); the
        # field-only steps contributed zero encoder grads — so a SECOND
        # group's encoder delta is again a single-step-sized move, while the
        # field moves every step. Spot check: encoder deltas nonzero (it did
        # update on the full step).
        enc0 = jax.tree_util.tree_leaves(params["params"]["encoder"])
        enc1 = jax.tree_util.tree_leaves(state1.params["params"]["encoder"])
        assert any(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
            for a, b in zip(enc0, enc1)
        )

    def test_masked_field_update_freezes_non_field_under_adam(self):
        """The production optimizer (clipped Adam) is STATEFUL: zero encoder
        grads on field-only steps would still move encoder params through the
        decaying first moment. masked_field_update must — for ARBITRARY
        nonzero grads — return exactly-zero updates for the non-field
        partition (encoder, joint-state decoder, deg-embedding) and carry its
        optimizer-state slices (Adam moments) through bitwise unchanged,
        while the field partition gets the ordinary Adam update. SGD cannot
        detect this (linear in grads) — that is why this test exists
        alongside the SGD replay."""
        import optax

        from aonerf.train import make_adam
        from aonerf.train.step_ae import masked_field_update

        model, buffers, params, (h, w) = self._setup()
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0, grad_clip=1.0)
        opt0 = tx.init(params)
        # warm the moments with one unmasked step so the frozen slices hold
        # NONZERO state a decay would visibly change
        g_rng = np.random.default_rng(7)
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(g_rng.standard_normal(p.shape), p.dtype), params
        )
        up, opt1 = tx.update(grads, opt0, params)
        params1 = optax.apply_updates(params, up)

        up2, opt2 = jax.jit(
            lambda g, o, p: masked_field_update(tx, g, o, p)
        )(grads, opt1, params1)

        frozen = ("encoder", "joint_state_decoder", "deg_embedding")

        def keys_of(path):
            return [getattr(k, "key", getattr(k, "name", None)) for k in path]

        # updates: exactly zero off-field, ordinary Adam on-field
        n_frozen = n_field = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(up2):
            if any(k in frozen for k in keys_of(path)):
                assert float(np.abs(np.asarray(leaf)).max()) == 0.0, path
                n_frozen += 1
            else:
                assert float(np.abs(np.asarray(leaf)).max()) > 0.0, path
                n_field += 1
        assert n_frozen > 0 and n_field > 0
        # opt state: frozen partition's moment slices bitwise == pre-update;
        # field slices and the shared count advanced
        old = dict(jax.tree_util.tree_leaves_with_path(opt1))
        moved = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(opt2):
            keys = keys_of(path)
            if any(k in frozen for k in keys):
                np.testing.assert_array_equal(
                    np.asarray(leaf), np.asarray(old[path]), err_msg=str(path)
                )
            elif "count" in keys:
                assert int(leaf) == int(old[path]) + 1
            elif float(np.abs(np.asarray(leaf) - np.asarray(old[path])).max()) > 0:
                moved += 1
        assert moved > 0  # field moments actually updated

    def test_field_only_steps_freeze_encoder_under_adam(self):
        """Integration wiring of masked_field_update: after an R-step
        encode-reuse group under clipped Adam, the non-field partition equals
        the result of the group's single FULL step alone (replayed with the
        same PRNG stream), while the field kept training. Tolerances absorb
        cross-compilation f32 noise (Adam's g/(|g|+eps) amplifies tiny grad
        reassociation diffs); the exact-zero semantics are pinned by
        test_masked_field_update_freezes_non_field_under_adam."""
        import optax

        from aonerf.train import create_train_state, make_adam
        from aonerf.train.step_ae import make_ae_device_train_step

        model, buffers, params, (h, w) = self._setup()
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0, grad_clip=1.0)
        R = 4
        step = make_ae_device_train_step(
            model, tx, True, 2.0, 6.0, img_wh=(w, h), batch_size=8,
            donate=False, inner_steps=R, encode_reuse=R,
        )
        state0 = create_train_state(params, tx)
        state1, _ = step(state0, buffers, jax.random.PRNGKey(5))
        assert int(state1.step) == R

        # replay ONLY the group's full step (same PRNG stream as the group's
        # step 0) — after it, the non-field partition must never move again
        from aonerf.train.step import sample_view, sample_view_pixels, view_src_image
        from aonerf.train.step_ae import _ae_loss_fn

        full_loss = _ae_loss_fn(model, True, 2.0, 6.0, True, 0.5,
                                return_latents=True)

        def full_step_only(p, buffers, base_key):
            opt = tx.init(p)
            k = jax.random.fold_in(base_key, 0)
            sample_key, render_key = jax.random.split(k)
            k_view, k_pix = jax.random.split(sample_key)
            view = sample_view(buffers, k_view)
            batch = sample_view_pixels(view, buffers["directions"], k_pix, 8)
            batch["src_imgs"] = view_src_image(view, (h, w))
            _, grads = jax.value_and_grad(full_loss, has_aux=True)(
                p, batch, render_key
            )
            up, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, up), opt

        want_params, _ = jax.jit(full_step_only)(
            params, buffers, jax.random.PRNGKey(5)
        )
        for sub in ("encoder", "joint_state_decoder", "deg_embedding"):
            got = jax.tree_util.tree_leaves(state1.params["params"][sub])
            want = jax.tree_util.tree_leaves(want_params["params"][sub])
            for a, b in zip(got, want):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5
                )
        # ... while the field DID keep training after the full step
        f_got = jax.tree_util.tree_leaves(state1.params["params"]["field"])
        f_full = jax.tree_util.tree_leaves(want_params["params"]["field"])
        assert any(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 1e-4
            for a, b in zip(f_got, f_full)
        )

    def test_reuse_with_views_per_step_rejected(self):
        import optax

        from aonerf.train.step_ae import make_ae_device_train_step

        model = AutoEncoderArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
        with pytest.raises(ValueError):
            make_ae_device_train_step(
                model, optax.sgd(1e-2), True, 2.0, 6.0, img_wh=(16, 12),
                batch_size=8, views_per_step=2, encode_reuse=2,
            )
