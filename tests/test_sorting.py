"""Tests for the bitonic merge and sorted-uniform sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aonerf.ops.sorting import bitonic_merge_sorted, sorted_uniform


class TestBitonicMerge:
    @pytest.mark.parametrize("na,nb", [(65, 128), (5, 3), (1, 7), (64, 64), (9, 120)])
    def test_matches_full_sort(self, na, nb):
        rng = np.random.default_rng(na * 100 + nb)
        a = np.sort(rng.uniform(0, 10, (16, na)).astype(np.float32), axis=-1)
        b = np.sort(rng.uniform(0, 10, (16, nb)).astype(np.float32), axis=-1)
        got = np.asarray(bitonic_merge_sorted(jnp.asarray(a), jnp.asarray(b)))
        want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
        np.testing.assert_array_equal(got, want)

    def test_with_duplicates_and_negatives(self):
        a = jnp.asarray([[-3.0, -3.0, 0.0, 2.0]])
        b = jnp.asarray([[-3.0, 2.0, 2.0]])
        got = np.asarray(bitonic_merge_sorted(a, b))
        np.testing.assert_array_equal(got, [[-3, -3, -3, 0, 2, 2, 2]])

    def test_gradients_flow(self):
        # merge is min/max compositions -> differentiable a.e.
        a = jnp.asarray([[1.0, 3.0]])
        b = jnp.asarray([[2.0, 4.0]])
        g = jax.grad(lambda x: jnp.sum(bitonic_merge_sorted(x, b) * jnp.arange(4.0)))(a)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSortedUniform:
    def test_sorted_and_in_range(self):
        u = np.asarray(sorted_uniform(jax.random.PRNGKey(0), (64, 128)))
        assert np.all(np.diff(u, axis=-1) >= 0)
        assert np.all(u > 0) and np.all(u < 1)

    def test_uniform_marginal_distribution(self):
        """Pooled samples must be U(0,1): compare the empirical CDF on a grid
        (Kolmogorov-Smirnov style bound for n=128*512 samples)."""
        u = np.asarray(sorted_uniform(jax.random.PRNGKey(1), (512, 128))).ravel()
        grid = np.linspace(0.05, 0.95, 19)
        ecdf = np.searchsorted(np.sort(u), grid) / len(u)
        assert np.max(np.abs(ecdf - grid)) < 0.01

    def test_order_statistics_mean(self):
        """k-th of n sorted uniforms has mean k/(n+1)."""
        n = 16
        u = np.asarray(sorted_uniform(jax.random.PRNGKey(2), (4000, n)))
        want = np.arange(1, n + 1) / (n + 1)
        np.testing.assert_allclose(u.mean(axis=0), want, atol=0.02)


class TestSamplePdfUsesMerge:
    def test_randomized_output_sorted(self):
        from aonerf.ops import sampling

        rng = np.random.default_rng(0)
        t_vals = np.sort(rng.uniform(2, 6, (32, 9)).astype(np.float32), -1)
        mids = 0.5 * (t_vals[:, 1:] + t_vals[:, :-1])
        w = rng.uniform(0, 1, (32, 9)).astype(np.float32)
        t, coords = sampling.sample_pdf(
            jnp.asarray(mids), jnp.asarray(w[:, 1:-1]), jnp.zeros((32, 3)),
            jnp.ones((32, 3)), jnp.asarray(t_vals), 16, randomized=True,
            key=jax.random.PRNGKey(3),
        )
        t = np.asarray(t)
        assert t.shape == (32, 25)
        assert np.all(np.diff(t, axis=-1) >= 0)
        # support: within [first coarse t, last coarse t]
        assert np.all(t >= t_vals[:, :1] - 1e-5)
        assert np.all(t <= t_vals[:, -1:] + 1e-5)
