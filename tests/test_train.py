"""Tests for LR schedule, losses, train steps, and a tiny overfit e2e."""

import jax
import jax.numpy as jnp
import numpy as np

from aonerf.models import ArticulatedNeRF, CodeLibraryArticulated, NeRF
from aonerf.train import (
    TrainState,
    code_regularization,
    create_train_state,
    log_lerp_lr,
    make_adam,
    make_autodecoder_train_step,
    make_vanilla_train_step,
    opacity_loss_bce,
    opacity_loss_mse,
    sample_ray_batch,
)


class TestLR:
    def test_reference_formula(self):
        # oracle: straight numpy transcription of the formula
        def ref(step, li=5e-4, lf=5e-6, ms=100_000, ds=2500, dm=0.01):
            delay = dm + (1 - dm) * np.sin(0.5 * np.pi * np.clip(step / ds, 0, 1))
            t = np.clip(step / ms, 0, 1)
            return delay * np.exp(np.log(li) * (1 - t) + np.log(lf) * t)

        for step in [0, 100, 2500, 50_000, 100_000, 200_000]:
            np.testing.assert_allclose(
                float(log_lerp_lr(jnp.asarray(step))), ref(step), rtol=1e-5
            )

    def test_delay_and_endpoints(self):
        assert abs(float(log_lerp_lr(jnp.asarray(0))) - 0.01 * 5e-4) < 1e-9
        assert abs(float(log_lerp_lr(jnp.asarray(100_000))) - 5e-6) < 1e-9
        # at step 2500 the delay has fully lifted but log-lerp decay applies:
        # 5e-4 * (lr_final/lr_init)^(2500/100000)
        want = 5e-4 * (5e-6 / 5e-4) ** 0.025
        assert abs(float(log_lerp_lr(jnp.asarray(2500))) - want) < 1e-8


class TestLosses:
    def test_code_regularization(self):
        lat = {
            "density": jnp.full((1, 4), 2.0),
            "color": jnp.full((1, 4), -1.0),
            "articulation": jnp.zeros((1, 4)),
        }
        # dim-0 norm of a (1, C) code is |value| per channel -> mean abs
        want = 1e-4 * (2.0 + 1.0 + 0.0)
        np.testing.assert_allclose(float(code_regularization(lat)), want, rtol=1e-6)

    def test_opacity_mse_perfect(self):
        mask = jnp.asarray([1.0, 0.0, 1.0])
        accs = [jnp.asarray([1.0, 0.0, 1.0])] * 2
        assert float(opacity_loss_mse(accs, mask)) < 1e-9

    def test_opacity_bce_scaled(self):
        mask = jnp.asarray([1.0, 0.0])
        accs = [jnp.asarray([10.0, -10.0])] * 2
        v = float(opacity_loss_bce(accs, mask, opacity_lambda=0.05))
        assert v < 0.01  # near-perfect logits -> tiny scaled loss

    def test_opacity_bce_prob_properties(self):
        """The probability-BCE variant must (a) be near-minimal at acc==mask,
        (b) pull an off-target field back toward the mask inside (0, 1), and
        (c) exert ZERO force at full saturation — the clip's dead zone is a
        deliberate force bound (losses.opacity_loss_bce_prob; RESULTS.md)."""
        import jax

        from aonerf.train.losses import opacity_loss_bce_prob

        mask = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        perfect = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        loss_perfect = float(opacity_loss_bce_prob([perfect] * 2, mask))
        dead = jnp.asarray([0.0, 1.0, 0.0, 1.0])  # fg empty, bg full haze
        loss_dead = float(opacity_loss_bce_prob([dead] * 2, mask))
        assert loss_perfect < 0.05 < loss_dead

        mid = jnp.asarray([0.3, 0.7, 0.3, 0.7])  # off target, inside (0,1)
        g_mid = jax.grad(
            lambda a: opacity_loss_bce_prob([a], mask, opacity_lambda=0.5)
        )(mid)
        assert float(g_mid[0]) < 0.0  # fg below target: pulled UP
        assert float(g_mid[1]) > 0.0  # bg above target: pushed DOWN

        g_dead = jax.grad(
            lambda a: opacity_loss_bce_prob([a], mask, opacity_lambda=0.5)
        )(dead)
        assert float(jnp.max(jnp.abs(g_dead))) == 0.0  # bounded: no shove

        # the reference's logits form pushes bg acc down even when correct:
        # grad = (sigmoid(acc) - 0) / n * lambda >= 0.5/n * lambda > 0
        near_perfect = jnp.asarray([1.0, 0.2, 1.0, 0.2])
        g_logits = jax.grad(
            lambda a: opacity_loss_bce([a], mask, opacity_lambda=0.5)
        )(near_perfect)
        assert float(g_logits[1]) > 0.05


def _toy_buffers(n=512, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (-4.0 * d).astype(np.float32)
    target = rng.uniform(size=(n, 3)).astype(np.float32)
    return {
        "rays_o": jnp.asarray(o),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(target),
    }


class TestVanillaStep:
    def test_sample_ray_batch_shapes(self):
        buf = _toy_buffers(100)
        batch = sample_ray_batch(buf, jax.random.PRNGKey(0), 32)
        assert batch["rays_o"].shape == (32, 3)
        assert batch["target"].shape == (32, 3)

    def test_step_runs_and_decreases_loss(self):
        model = NeRF(num_coarse_samples=8, num_fine_samples=8)
        buf = _toy_buffers(256)
        dummy = {k: v[:8] for k, v in buf.items()}
        params = model.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0)
        tx = make_adam(lr_init=5e-3, lr_delay_steps=0)
        state = create_train_state(params, tx)
        step = make_vanilla_train_step(
            model, tx, white_bkgd=True, near=2.0, far=6.0, batch_size=64, donate=False
        )
        base_key = jax.random.PRNGKey(42)
        losses = []
        for _ in range(12):
            state, metrics = step(state, buf, base_key)
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 12
        assert np.isfinite(losses).all()
        assert np.mean(losses[-4:]) < np.mean(losses[:4])

    def test_metrics_contain_lr(self):
        model = NeRF(num_coarse_samples=4, num_fine_samples=4)
        buf = _toy_buffers(64)
        dummy = {k: v[:4] for k, v in buf.items()}
        params = model.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0)
        tx = make_adam()
        state = create_train_state(params, tx)
        step = make_vanilla_train_step(
            model, tx, white_bkgd=True, near=2.0, far=6.0, batch_size=16, donate=False
        )
        state, metrics = step(state, buf, jax.random.PRNGKey(0))
        assert set(metrics) >= {"loss", "psnr0", "psnr1", "lr"}
        np.testing.assert_allclose(float(metrics["lr"]), float(log_lerp_lr(0)), rtol=1e-5)


class TestAutodecoderStep:
    def test_joint_optimization_updates_codes(self):
        model = ArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
        lib = CodeLibraryArticulated(n_max_objs=2)
        buf = _toy_buffers(64)
        batch = {k: v[:32] for k, v in buf.items()}
        batch["instance_id"] = jnp.asarray(0)
        batch["articulation_id"] = jnp.asarray(1)

        lib_params = lib.init(jax.random.PRNGKey(1), jnp.asarray(0), jnp.asarray(0))
        latents = lib.apply(lib_params, jnp.asarray(0), jnp.asarray(0))
        latents = {k: jnp.atleast_2d(v) for k, v in latents.items()}
        model_params = model.init(
            jax.random.PRNGKey(0), batch, False, True, 2.0, 6.0, latents
        )
        params = {"model": model_params, "codes": lib_params}
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0)
        state = create_train_state(params, tx)
        step = make_autodecoder_train_step(
            model, lib, tx, white_bkgd=True, near=2.0, far=6.0, donate=False
        )
        table_before = np.asarray(
            params["codes"]["params"]["embedding_instance_articulation"]["embedding"]
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        table_after = np.asarray(
            state.params["codes"]["params"]["embedding_instance_articulation"]["embedding"]
        )
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss_reg"]) > 0
        # only the looked-up articulation row gets a gradient
        assert not np.allclose(table_before[1], table_after[1])
        np.testing.assert_allclose(table_before[0], table_after[0], atol=1e-7)


class TestMultiStep:
    def test_scan_fused_steps_match_single(self):
        """K scan-fused steps must equal K single steps exactly (same PRNG
        derivation from fold_in(base_key, step))."""
        from aonerf.train.step import make_vanilla_train_multi_step

        model = NeRF(num_coarse_samples=4, num_fine_samples=4)
        buf = _toy_buffers(128)
        dummy = {k: v[:4] for k, v in buf.items()}
        params = model.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0)
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0)
        key = jax.random.PRNGKey(5)

        single = make_vanilla_train_step(
            model, tx, True, 2.0, 6.0, batch_size=32, donate=False
        )
        s1 = create_train_state(params, tx)
        for _ in range(4):
            s1, m1 = single(s1, buf, key)

        multi = make_vanilla_train_multi_step(
            model, tx, True, 2.0, 6.0, batch_size=32, inner_steps=4, donate=False
        )
        s4 = create_train_state(params, tx)
        s4, m4 = multi(s4, buf, key)

        assert int(s4.step) == 4
        np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s4.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
