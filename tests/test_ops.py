"""Unit tests of aonerf.ops vs independent NumPy oracles and properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aonerf import ops
from aonerf.ops.encoding import pos_enc_dim
from tests import oracles

RTOL = 1e-5
ATOL = 1e-5


class TestPosEnc:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((7, 5, 3)).astype(np.float32)
        got = np.asarray(ops.pos_enc(jnp.asarray(x), 0, 10))
        want = oracles.pos_enc_np(x, 0, 10)
        assert got.shape == (7, 5, 63)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_view_encoding_dim(self):
        x = jnp.ones((4, 3))
        assert ops.pos_enc(x, 0, 4).shape == (4, 27)
        assert pos_enc_dim(3, 0, 4) == 27
        assert pos_enc_dim(3, 0, 10) == 63

    def test_scale_major_ordering(self):
        # feature block i*D..(i+1)*D of the sin part must be sin(2^i * x)
        x = np.array([[0.1, 0.2, 0.3]], dtype=np.float32)
        got = np.asarray(ops.pos_enc(jnp.asarray(x), 0, 3))
        for i in range(3):
            np.testing.assert_allclose(
                got[:, 3 + i * 3 : 3 + (i + 1) * 3], np.sin(x * 2.0**i), rtol=1e-6
            )


class TestSampleAlongRays:
    def test_deterministic_linear(self):
        o = jnp.zeros((4, 3))
        d = jnp.asarray(np.tile([0.0, 0.0, -1.0], (4, 1)), dtype=jnp.float32)
        t, coords = ops.sample_along_rays(o, d, 8, 2.0, 6.0, randomized=False, lindisp=False)
        assert t.shape == (4, 9)
        np.testing.assert_allclose(np.asarray(t[0]), oracles.stratified_tvals_np(8, 2.0, 6.0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(coords[0, 0]), [0, 0, -2.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(coords[0, -1]), [0, 0, -6.0], atol=1e-6)

    def test_deterministic_lindisp(self):
        o = jnp.zeros((2, 3))
        d = jnp.ones((2, 3))
        t, _ = ops.sample_along_rays(o, d, 16, 2.0, 6.0, randomized=False, lindisp=True)
        np.testing.assert_allclose(
            np.asarray(t[0]), oracles.stratified_tvals_np(16, 2.0, 6.0, lindisp=True), rtol=1e-6
        )

    def test_randomized_within_bins(self):
        key = jax.random.PRNGKey(1)
        o = jnp.zeros((64, 3))
        d = jnp.ones((64, 3))
        t, _ = ops.sample_along_rays(o, d, 32, 2.0, 6.0, randomized=True, lindisp=False, key=key)
        base = oracles.stratified_tvals_np(32, 2.0, 6.0)
        mids = 0.5 * (base[1:] + base[:-1])
        lower = np.concatenate([[base[0]], mids])
        upper = np.concatenate([mids, [base[-1]]])
        t = np.asarray(t)
        assert np.all(t >= lower - 1e-6) and np.all(t <= upper + 1e-6)
        # jitter should actually vary across rays
        assert np.std(t[:, 5]) > 1e-3


class TestVolumetricRendering:
    def _random_inputs(self, n_rays=16, n_samples=9, seed=0):
        rng = np.random.default_rng(seed)
        rgb = rng.uniform(size=(n_rays, n_samples, 3)).astype(np.float32)
        sigma = rng.uniform(0, 3, size=(n_rays, n_samples, 1)).astype(np.float32)
        t = np.sort(rng.uniform(2, 6, size=(n_rays, n_samples)).astype(np.float32), axis=-1)
        dirs = rng.standard_normal((n_rays, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        return rgb, sigma, t, dirs

    @pytest.mark.parametrize("white", [False, True])
    def test_matches_oracle(self, white):
        rgb, sigma, t, dirs = self._random_inputs()
        got = ops.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t), jnp.asarray(dirs), white
        )
        want = oracles.volumetric_rendering_np(rgb, sigma, t, dirs, white)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-5)

    def test_nocs_compositing_branch(self):
        """The optional NOCS branch (reference helper.py:186-193): passing a
        per-sample nocs field returns (comp_rgb, acc, weights, comp_nocs)
        with comp_nocs the weights-weighted sum of the nocs samples; the
        rgb/acc/weights outputs are identical to the plain call."""
        rgb, sigma, t, dirs = self._random_inputs(seed=4)
        nocs = np.random.default_rng(5).uniform(size=rgb.shape).astype(np.float32)
        plain = ops.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t), jnp.asarray(dirs), False
        )
        comp, acc, w, comp_nocs = ops.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t), jnp.asarray(dirs),
            False, nocs=jnp.asarray(nocs),
        )
        for a, b in zip(plain[:3], (comp, acc, w)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        want = np.sum(np.asarray(plain[2])[..., None] * nocs, axis=-2)
        np.testing.assert_allclose(np.asarray(comp_nocs), want, rtol=1e-5, atol=1e-6)

    def test_opaque_surface(self):
        # A single very dense sample -> pixel == its rgb, depth == its t.
        n = 4
        rgb = np.zeros((n, 3, 3), dtype=np.float32)
        rgb[:, 1] = [0.25, 0.5, 0.75]
        sigma = np.zeros((n, 3, 1), dtype=np.float32)
        sigma[:, 1] = 1e9
        t = np.tile(np.array([2.0, 3.0, 4.0], dtype=np.float32), (n, 1))
        dirs = np.tile(np.array([0.0, 0.0, -1.0], dtype=np.float32), (n, 1))
        comp, acc, w, depth = ops.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t), jnp.asarray(dirs), False
        )
        np.testing.assert_allclose(np.asarray(comp), rgb[:, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), 3.0, atol=1e-4)

    def test_empty_space_white_background(self):
        n = 3
        rgb = np.random.default_rng(0).uniform(size=(n, 5, 3)).astype(np.float32)
        sigma = np.zeros((n, 5, 1), dtype=np.float32)
        t = np.tile(np.linspace(2, 6, 5, dtype=np.float32), (n, 1))
        dirs = np.tile([0.0, 0.0, -1.0], (n, 1)).astype(np.float32)
        comp, acc, _, _ = ops.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t), jnp.asarray(dirs), True
        )
        np.testing.assert_allclose(np.asarray(comp), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-5)

    def test_transmittance_weights_bounded(self):
        rgb, sigma, t, dirs = self._random_inputs(32, 17, seed=3)
        _, acc, w, _ = ops.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma * 10), jnp.asarray(t), jnp.asarray(dirs), False
        )
        w = np.asarray(w)
        assert np.all(w >= 0)
        assert np.all(np.asarray(acc) <= 1.0 + 1e-4)

    def test_dirs_norm_scaling(self):
        # doubling |dirs| doubles effective optical depth
        rgb, sigma, t, dirs = self._random_inputs(8, 7, seed=4)
        c1, a1, _, _ = ops.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(t), jnp.asarray(dirs), False
        )
        c2, a2, _, _ = ops.volumetric_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma / 2), jnp.asarray(t), jnp.asarray(dirs * 2), False
        )
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-4, atol=1e-5)


class TestPDFSampling:
    def test_matches_oracle_deterministic(self):
        rng = np.random.default_rng(0)
        n_rays, n_bins, n_samp = 9, 12, 17
        bins = np.sort(rng.uniform(2, 6, (n_rays, n_bins)).astype(np.float32), -1)
        weights = rng.uniform(0, 1, (n_rays, n_bins - 1)).astype(np.float32)
        got = ops.sorted_piecewise_constant_pdf(
            jnp.asarray(bins), jnp.asarray(weights), n_samp, randomized=False
        )
        # fp32: the 1 - 2^-32 endpoint rounds to exactly 1.0, as on device
        u = np.broadcast_to(
            np.linspace(0.0, 1.0 - 2.0**-32, n_samp).astype(np.float32),
            (n_rays, n_samp),
        )
        want = oracles.inverse_cdf_np(bins, weights, u)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_zero_weights_padding(self):
        # all-zero weights must not NaN; samples stay within support
        bins = jnp.asarray(np.linspace(2, 6, 8, dtype=np.float32))[None, :].repeat(3, 0)
        weights = jnp.zeros((3, 7))
        s = ops.sorted_piecewise_constant_pdf(bins, weights, 11, randomized=False)
        s = np.asarray(s)
        assert np.all(np.isfinite(s))
        assert np.all(s >= 2.0 - 1e-5) and np.all(s <= 6.0 + 1e-5)

    def test_samples_within_support_randomized(self):
        rng = np.random.default_rng(5)
        bins = np.sort(rng.uniform(2, 6, (16, 10)).astype(np.float32), -1)
        weights = rng.uniform(0, 1, (16, 9)).astype(np.float32)
        s = ops.sorted_piecewise_constant_pdf(
            jnp.asarray(bins), jnp.asarray(weights), 33, randomized=True, key=jax.random.PRNGKey(0)
        )
        s = np.asarray(s)
        assert np.all(s >= bins[:, :1] - 1e-5) and np.all(s <= bins[:, -1:] + 1e-5)

    def test_concentrates_mass(self):
        # weight mass in one bin -> most samples land in that bin
        bins = jnp.asarray(np.linspace(0, 10, 11, dtype=np.float32))[None].repeat(2, 0)
        weights = np.full((2, 10), 1e-4, dtype=np.float32)
        weights[:, 4] = 10.0
        s = np.asarray(
            ops.sorted_piecewise_constant_pdf(bins, jnp.asarray(weights), 64, randomized=False)
        )
        frac = np.mean((s >= 4.0) & (s <= 5.0))
        assert frac > 0.9

    def test_sample_pdf_merge_sorted_and_detached(self):
        rng = np.random.default_rng(1)
        n_rays = 6
        t_vals = np.sort(rng.uniform(2, 6, (n_rays, 9)).astype(np.float32), -1)
        t_mids = 0.5 * (t_vals[:, 1:] + t_vals[:, :-1])
        weights = rng.uniform(0, 1, (n_rays, 9)).astype(np.float32)
        o = jnp.zeros((n_rays, 3))
        d = jnp.ones((n_rays, 3))

        t_new, coords = ops.sample_pdf(
            jnp.asarray(t_mids), jnp.asarray(weights[:, 1:-1]), o, d,
            jnp.asarray(t_vals), 16, randomized=False,
        )
        t_new = np.asarray(t_new)
        assert t_new.shape == (n_rays, 25)
        assert np.all(np.diff(t_new, axis=-1) >= 0)
        assert coords.shape == (n_rays, 25, 3)

        # gradient does not flow into the resampled t positions via weights
        def f(w):
            t, _ = ops.sample_pdf(
                jnp.asarray(t_mids), w, o, d, jnp.asarray(t_vals), 16, randomized=False
            )
            return jnp.sum(t)

        g = jax.grad(f)(jnp.asarray(weights[:, 1:-1]))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


class TestMath:
    def test_psnr(self):
        mse = jnp.asarray(1e-2)
        np.testing.assert_allclose(float(ops.mse2psnr(mse)), 20.0, rtol=1e-5)
        x = jnp.asarray([[0.0, 1.0]])
        y = jnp.asarray([[0.5, 1.0]])
        np.testing.assert_allclose(float(ops.img2mse(x, y)), 0.125, rtol=1e-6)
