"""Shape/semantics tests for the Flax neural fields."""

import jax
import jax.numpy as jnp
import numpy as np

from aonerf.models import (
    ArticulatedNeRF,
    ArticulatedNeRFMLP,
    CodeLibraryArticulated,
    JointStateDecoder,
    NeRF,
    NeRFMLP,
)


def _rays(n=8, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (-4.0 * d + 0.05 * rng.standard_normal((n, 3))).astype(np.float32)
    return {
        "rays_o": jnp.asarray(o),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
    }


class TestNeRFMLP:
    def test_shapes_and_param_structure(self):
        mlp = NeRFMLP()
        x = jnp.ones((4, 9, 63))
        cond = jnp.ones((4, 27))
        params = mlp.init(jax.random.PRNGKey(0), x, cond)
        rgb, sigma = mlp.apply(params, x, cond)
        assert rgb.shape == (4, 9, 3)
        assert sigma.shape == (4, 9, 1)
        p = params["params"]
        # skip layer: pts_5 consumes 256 + 63 features
        assert p["pts_5"]["kernel"].shape == (256 + 63, 256)
        assert p["pts_0"]["kernel"].shape == (63, 256)
        assert p["views_0"]["kernel"].shape == (256 + 27, 128)

    def test_skip_connection_matters(self):
        # zeroing the skip portion of pts_5's kernel changes the output
        mlp = NeRFMLP()
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 63)), dtype=jnp.float32)
        cond = jnp.zeros((2, 27))
        params = mlp.init(jax.random.PRNGKey(1), x, cond)
        rgb1, _ = mlp.apply(params, x, cond)
        params2 = jax.tree_util.tree_map(lambda a: a, params)
        kernel = params2["params"]["pts_5"]["kernel"]
        params2["params"]["pts_5"]["kernel"] = kernel.at[256:].set(0.0)
        rgb2, _ = mlp.apply(params2, x, cond)
        assert not np.allclose(np.asarray(rgb1), np.asarray(rgb2))


class TestNeRF:
    def test_two_level_output(self):
        model = NeRF(num_coarse_samples=8, num_fine_samples=16)
        rays = _rays(6)
        params = model.init(
            jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0
        )
        out = model.apply(params, rays, False, True, 2.0, 6.0)
        assert len(out) == 2
        for comp_rgb, acc, depth in out:
            assert comp_rgb.shape == (6, 3)
            assert acc.shape == (6,)
            assert depth.shape == (6,)
            assert np.all(np.isfinite(np.asarray(comp_rgb)))

    def test_randomized_needs_key_and_differs(self):
        model = NeRF(num_coarse_samples=8, num_fine_samples=16)
        rays = _rays(4)
        params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0)
        o1 = model.apply(params, rays, True, True, 2.0, 6.0, key=jax.random.PRNGKey(1))
        o2 = model.apply(params, rays, True, True, 2.0, 6.0, key=jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(o1[0][0]), np.asarray(o2[0][0]))

    def test_grads_flow_to_both_mlps(self):
        model = NeRF(num_coarse_samples=4, num_fine_samples=8)
        rays = _rays(4)
        params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0)
        # relu sigma can be dead-at-init (all raw sigma <= 0 -> exactly zero
        # grads, a property of the reference architecture as well); nudge the
        # density biases positive so the gradient path is exercised.
        for mlp in ("coarse_mlp", "fine_mlp"):
            b = params["params"][mlp]["density"]["bias"]
            params["params"][mlp]["density"]["bias"] = b + 0.5

        def loss(p):
            out = model.apply(p, rays, False, True, 2.0, 6.0)
            return sum(jnp.mean(level[0] ** 2) for level in out)

        g = jax.grad(loss)(params)
        gnorms = jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()), g)
        coarse = gnorms["params"]["coarse_mlp"]
        fine = gnorms["params"]["fine_mlp"]
        assert max(v["kernel"] for v in coarse.values()) > 0
        assert max(v["kernel"] for v in fine.values()) > 0


class TestCodeLibrary:
    def test_lookup_shapes(self):
        lib = CodeLibraryArticulated(n_max_objs=4)
        params = lib.init(jax.random.PRNGKey(0), jnp.asarray(0), jnp.asarray(1))
        out = lib.apply(params, jnp.asarray(2), jnp.asarray(3))
        assert out["density"].shape == (128,)
        assert out["color"].shape == (128,)
        assert out["articulation"].shape == (32,)

    def test_interpolation_structure(self):
        lib = CodeLibraryArticulated(n_max_objs=2)
        params = lib.init(jax.random.PRNGKey(0), jnp.asarray(0), jnp.asarray(0))
        table = np.asarray(
            params["params"]["embedding_instance_articulation"]["embedding"]
        )
        interp = np.asarray(
            lib.apply(params, method=lib.get_interpolated_articulations)
        )
        assert interp.shape == (19, 32)
        np.testing.assert_allclose(interp[0::2], table, atol=1e-6)
        np.testing.assert_allclose(
            interp[1::2], 0.5 * (table[:-1] + table[1:]), atol=1e-6
        )

    def test_test_time_lookup_uses_interpolation(self):
        lib = CodeLibraryArticulated(n_max_objs=2)
        params = lib.init(jax.random.PRNGKey(0), jnp.asarray(0), jnp.asarray(0))
        out = lib.apply(params, jnp.asarray(0), jnp.asarray(3), is_test=True)
        interp = np.asarray(lib.apply(params, method=lib.get_interpolated_articulations))
        np.testing.assert_allclose(np.asarray(out["articulation"]), interp[3], atol=1e-6)


class TestArticulated:
    def _latents(self):
        rng = np.random.default_rng(0)
        return {
            "density": jnp.asarray(rng.standard_normal((1, 128)), dtype=jnp.float32),
            "color": jnp.asarray(rng.standard_normal((1, 128)), dtype=jnp.float32),
            "articulation": jnp.asarray(rng.standard_normal((1, 32)), dtype=jnp.float32),
        }

    def test_mlp_shapes(self):
        mlp = ArticulatedNeRFMLP()
        pos = jnp.ones((4, 5, 3))
        cond = jnp.ones((4, 27))
        params = mlp.init(jax.random.PRNGKey(0), pos, cond, self._latents())
        rgb, sigma = mlp.apply(params, pos, cond, self._latents())
        assert rgb.shape == (4, 5, 3)
        assert sigma.shape == (4, 5, 1)
        p = params["params"]
        assert p["deform_0"]["kernel"].shape == (3 + 128 + 32, 128)
        assert p["deform_out"]["kernel"].shape == (128, 3)
        assert p["pts_0"]["kernel"].shape == (63 + 128, 256)
        assert p["views_0"]["kernel"].shape == (256 + 27 + 128, 128)

    def test_articulation_code_changes_geometry(self):
        model = ArticulatedNeRF(num_coarse_samples=8, num_fine_samples=8)
        rays = _rays(4)
        lat = self._latents()
        params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0, lat)
        out1 = model.apply(params, rays, False, True, 2.0, 6.0, lat)
        lat2 = dict(lat, articulation=lat["articulation"] + 1.0)
        out2 = model.apply(params, rays, False, True, 2.0, 6.0, lat2)
        assert not np.allclose(np.asarray(out1[1][0]), np.asarray(out2[1][0]))

    def test_cond_dense_matches_concat_vanilla(self):
        """NeRFMLP.cond_dense (per-ray view-condition contraction): same
        params, same outputs as the tiled-concat schedule."""
        from aonerf.models import NeRFMLP

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((5, 7, 63)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((5, 27)), jnp.float32)
        mlp = NeRFMLP()
        mlp_cd = NeRFMLP(cond_dense=True)
        params = mlp.init(jax.random.PRNGKey(0), x, cond)
        params_cd = mlp_cd.init(jax.random.PRNGKey(0), x, cond)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
            params_cd
        )
        rgb_a, sig_a = mlp.apply(params, x, cond)
        rgb_b, sig_b = mlp_cd.apply(params, x, cond)
        np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b), atol=1e-4)
        np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_b), atol=1e-4)

    def test_latent_dense_matches_concat(self):
        """latent_dense=True contracts latent kernel columns per view instead
        of materializing rows x C broadcasts; same params, same outputs."""
        mlp = ArticulatedNeRFMLP()
        mlp_ld = ArticulatedNeRFMLP(latent_dense=True)
        rng = np.random.default_rng(1)
        pos = jnp.asarray(rng.standard_normal((6, 5, 3)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((6, 27)), jnp.float32)
        lat = self._latents()
        params = mlp.init(jax.random.PRNGKey(0), pos, cond, lat)
        # The param pytrees are identical, so concat-path params load directly.
        params_ld = mlp_ld.init(jax.random.PRNGKey(0), pos, cond, lat)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
            params_ld
        )
        assert [l.shape for l in jax.tree_util.tree_leaves(params)] == [
            l.shape for l in jax.tree_util.tree_leaves(params_ld)
        ]
        rgb_a, sig_a = mlp.apply(params, pos, cond, lat)
        rgb_b, sig_b = mlp_ld.apply(params, pos, cond, lat)
        np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b), atol=1e-4)
        np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_b), atol=1e-4)

    def test_latent_dense_matches_concat_multiview(self):
        """(V, C) per-view latents: each view's codes condition its own slice
        of the rays in both schedules."""
        rng = np.random.default_rng(2)
        lat = {
            "density": jnp.asarray(rng.standard_normal((2, 128)), jnp.float32),
            "color": jnp.asarray(rng.standard_normal((2, 128)), jnp.float32),
            "articulation": jnp.asarray(rng.standard_normal((2, 32)), jnp.float32),
        }
        pos = jnp.asarray(rng.standard_normal((6, 5, 3)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((6, 27)), jnp.float32)
        mlp = ArticulatedNeRFMLP()
        mlp_ld = ArticulatedNeRFMLP(latent_dense=True)
        params = mlp.init(jax.random.PRNGKey(0), pos, cond, lat)
        rgb_a, sig_a = mlp.apply(params, pos, cond, lat)
        rgb_b, sig_b = mlp_ld.apply(params, pos, cond, lat)
        np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b), atol=1e-4)
        np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_b), atol=1e-4)

    def test_latent_dense_grads_match(self):
        kw = dict(netdepth=6, netwidth=32, netdepth_deformation=2,
                  netwidth_deformation=16, netdepth_condition=2,
                  netwidth_condition=16)
        mlp = ArticulatedNeRFMLP(**kw)
        mlp_ld = ArticulatedNeRFMLP(latent_dense=True, **kw)
        rng = np.random.default_rng(3)
        pos = jnp.asarray(rng.standard_normal((4, 3, 3)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((4, 27)), jnp.float32)
        lat = self._latents()
        params = mlp.init(jax.random.PRNGKey(0), pos, cond, lat)

        def loss(m):
            def f(p):
                rgb, sig = m.apply(p, pos, cond, lat)
                return jnp.sum(rgb**2) + jnp.sum(sig**2)
            return f

        g_a = jax.grad(loss(mlp))(params)
        g_b = jax.grad(loss(mlp_ld))(params)
        # f32 associativity: the split dots re-order the same sums; measured
        # max relative drift ~1e-3 at O(100) gradient magnitudes.
        for a, b in zip(jax.tree_util.tree_leaves(g_a), jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-3
            )

    def test_rgb_padding_range(self):
        model = ArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
        rays = _rays(4)
        lat = self._latents()
        params = model.init(jax.random.PRNGKey(0), rays, False, False, 2.0, 6.0, lat)
        out = model.apply(params, rays, False, False, 2.0, 6.0, lat)
        rgb = np.asarray(out[0][0])
        assert np.all(rgb >= -0.001 - 1.0)  # composited; just finite sanity
        assert np.all(np.isfinite(rgb))


class TestJointState:
    def test_shapes(self):
        dec = JointStateDecoder()
        x = jnp.ones((5, 32))
        params = dec.init(jax.random.PRNGKey(0), x)
        y = dec.apply(params, x)
        assert y.shape == (5, 1)
