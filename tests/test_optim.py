"""Tests for the optimizer/scheduler factory vs reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aonerf.train.optim import (
    make_optimizer,
    make_optimizer_with_latent,
    make_schedule,
    with_warmup,
)


class TestSchedules:
    def test_steplr_milestones(self):
        s = make_schedule("steplr", 1.0, decay_step=[2, 4], decay_gamma=0.1, steps_per_epoch=10)
        np.testing.assert_allclose(float(s(0)), 1.0)
        np.testing.assert_allclose(float(s(19)), 1.0)
        np.testing.assert_allclose(float(s(20)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(40)), 0.01, rtol=1e-6)

    def test_cosine_endpoints(self):
        s = make_schedule("cosine", 1.0, num_epochs=10, steps_per_epoch=1)
        np.testing.assert_allclose(float(s(0)), 1.0, rtol=1e-6)
        assert float(s(10)) < 1e-6
        np.testing.assert_allclose(float(s(5)), 0.5, atol=1e-6)

    def test_poly(self):
        s = make_schedule("poly", 2.0, num_epochs=10, poly_exp=2.0, steps_per_epoch=1)
        np.testing.assert_allclose(float(s(0)), 2.0)
        np.testing.assert_allclose(float(s(5)), 2.0 * 0.25, rtol=1e-6)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_schedule("bogus", 1.0)

    def test_warmup_ramp_and_handoff(self):
        base = make_schedule("poly", 1.0, num_epochs=10, poly_exp=1.0, steps_per_epoch=1)
        s = with_warmup(base, 1.0, warmup_multiplier=2.0, warmup_epochs=4, steps_per_epoch=1)
        # ramp: lr * ((m-1)*e/total + 1)
        np.testing.assert_allclose(float(s(0)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(s(2)), 1.5, rtol=1e-6)
        np.testing.assert_allclose(float(s(4)), 2.0, rtol=1e-6)
        # after: base(step - total) * multiplier
        np.testing.assert_allclose(float(s(6)), (1.0 - 0.2) * 2.0, rtol=1e-6)


class TestOptimizers:
    def _params(self):
        return {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}

    @pytest.mark.parametrize("name", ["sgd", "adam", "radam", "ranger"])
    def test_single_update_runs(self, name):
        tx = make_optimizer(name, learning_rate=1e-2, weight_decay=1e-4)
        params = self._params()
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        leaves = jax.tree_util.tree_leaves(new)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert not np.allclose(
            np.asarray(jax.tree_util.tree_leaves(params)[0]),
            np.asarray(leaves[0]),
        )

    def test_flat_lookahead_sync_semantics(self):
        """flat_lookahead on plain param pytrees: between syncs the params
        follow the inner optimizer exactly; at the sync step the params jump
        to slow + alpha*(fast - slow) with slow anchored at the start."""
        from aonerf.train.optim import flat_lookahead

        inner = optax.sgd(0.1)
        tx = flat_lookahead(inner, sync_period=3, slow_step_size=0.5)
        p0 = {"w": jnp.asarray([1.0, 2.0])}
        g = {"w": jnp.asarray([1.0, 1.0])}
        state = tx.init(p0)
        p = p0
        for step in range(1, 4):
            updates, state = tx.update(g, state, p)
            p = optax.apply_updates(p, updates)
            if step < 3:  # pure sgd: w - 0.1*step
                np.testing.assert_allclose(
                    np.asarray(p["w"]), np.asarray(p0["w"]) - 0.1 * step, rtol=1e-6
                )
        # sync at step 3: fast would be p0-0.3; slow=p0; blended halfway
        np.testing.assert_allclose(
            np.asarray(p["w"]), np.asarray(p0["w"]) - 0.15, rtol=1e-6
        )

    def test_build_from_config_default_is_loglerp_adam(self):
        from aonerf.train.lr import log_lerp_lr
        from aonerf.train.optim import build_optimizer_from_config
        from aonerf.utils.config import Config

        cfg = Config()
        tx, lr_fn = build_optimizer_from_config(cfg)
        np.testing.assert_allclose(
            float(lr_fn(0)),
            float(log_lerp_lr(0, lr_init=cfg.lr_init, lr_final=cfg.lr_final,
                              max_steps=cfg.run_max_steps,
                              lr_delay_steps=cfg.lr_delay_steps,
                              lr_delay_mult=cfg.lr_delay_mult)),
            rtol=1e-6,
        )
        params = {"w": jnp.ones((2,))}
        state = tx.init(params)
        u, _ = tx.update({"w": jnp.ones((2,))}, state, params)
        assert np.all(np.isfinite(np.asarray(u["w"])))

    def test_build_from_config_latent_split(self):
        """latent_lr routes the codes subtree to its own AdamW."""
        from aonerf.train.optim import build_optimizer_from_config
        from aonerf.utils.config import Config

        cfg = Config(
            exp_type="vanilla_autodecoder", optimizer="sgd", lr_scheduler="poly",
            lr_init=1e-4, momentum=0.0, latent_lr=1e-1,
        )
        tx, _ = build_optimizer_from_config(cfg)
        params = {"model": {"w": jnp.ones((2,))}, "codes": {"e": jnp.ones((2,))}}
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert abs(float(updates["model"]["w"][0])) < 1e-3  # sgd @ 1e-4
        assert abs(float(updates["codes"]["e"][0])) > 5e-2  # adamw @ 1e-1

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_optimizer("bogus")

    def test_latent_split_lrs(self):
        """The codes subtree must move at latent_lr, the model at its own."""
        model_tx = make_optimizer("sgd", learning_rate=1e-3, momentum=0.0)
        tx = make_optimizer_with_latent(model_tx, latent_lr=1e-1)
        params = {"model": {"w": jnp.ones((2,))}, "codes": {"e": jnp.ones((2,))}}
        state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, state = tx.update(grads, state, params)
        # sgd: delta = -lr * g; adamw first step: ~ -lr * sign-ish
        assert abs(float(updates["model"]["w"][0])) < 5e-3
        assert abs(float(updates["codes"]["e"][0])) > 5e-2


class TestGradClip:
    def test_make_adam_grad_clip_caps_update(self):
        """grad_clip chains a global-norm clip ahead of Adam: a huge gradient
        must produce the same update direction/magnitude as a rescaled one."""
        from aonerf.train.step import make_adam

        params = {"w": jnp.ones((4,))}
        g_big = {"w": jnp.full((4,), 1e6)}
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0, grad_clip=1.0)
        state = tx.init(params)
        upd_big, _ = tx.update(g_big, state, params)
        # the clipped gradient has global norm exactly 1.0
        g_unit = jax.tree_util.tree_map(
            lambda g: g / jnp.sqrt(jnp.sum(g**2)), g_big
        )
        tx2 = make_adam(lr_init=1e-3, lr_delay_steps=0)
        upd_unit, _ = tx2.update(g_unit, tx2.init(params), params)
        np.testing.assert_allclose(
            np.asarray(upd_big["w"]), np.asarray(upd_unit["w"]), rtol=1e-5
        )

    def test_make_adam_no_clip_default(self):
        from aonerf.train.step import make_adam

        params = {"w": jnp.ones((2,))}
        tx = make_adam(lr_init=1.0, lr_delay_steps=0)
        g = {"w": jnp.full((2,), 100.0)}
        upd, _ = tx.update(g, tx.init(params), params)
        # unclipped Adam normalizes by |g| itself -> step size ~ lr
        assert float(jnp.abs(upd["w"]).max()) > 0.9
