"""Parity harness: pixels and pixel GRADIENTS vs independent reference math.

BASELINE.md's north-star: rendered pixels and their gradients must be
allclose to the reference implementation's math. The oracle here is a
from-scratch fp64 NumPy re-derivation (tests/oracles.py: per-ray loops,
literal cumulative products, scan-based inverse CDF) — structurally disjoint
from the jnp implementation, so agreement is strong evidence both encode the
reference semantics.

Gradient parity runs in an x64 subprocess (JAX_ENABLE_X64 is global) and
checks jax.grad against central finite differences of the NumPy oracle.
"""

import os
import subprocess
import sys
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aonerf.models import NeRF
from tests import oracles


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = -4.0 * d + 0.05 * rng.standard_normal((n, 3))
    return o, d


class TestPixelParity:
    def test_full_forward_matches_fp64_oracle(self):
        """fp32 jnp forward vs fp64 oracle: both hierarchy levels."""
        n_coarse, n_fine = 8, 16
        o, d = _rays(12)
        model = NeRF(num_coarse_samples=n_coarse, num_fine_samples=n_fine)
        rays = {
            "rays_o": jnp.asarray(o, jnp.float32),
            "rays_d": jnp.asarray(d, jnp.float32),
            "viewdirs": jnp.asarray(d, jnp.float32),
        }
        params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0)
        got = model.apply(params, rays, False, True, 2.0, 6.0)

        np_params = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), params
        )["params"]
        want = oracles.nerf_forward_np(
            np_params, o, d, d, n_coarse, n_fine, 2.0, 6.0, True
        )
        for level in range(2):
            np.testing.assert_allclose(
                np.asarray(got[level][0]), want[level][0], rtol=2e-4, atol=2e-4,
                err_msg=f"level {level} comp_rgb",
            )
            np.testing.assert_allclose(
                np.asarray(got[level][1]), want[level][1], rtol=2e-4, atol=2e-4,
                err_msg=f"level {level} acc",
            )

    def test_fused_kernel_matches_oracle(self):
        """Pallas fused kernel (interpret mode on CPU) vs the fp64 oracle."""
        from aonerf.models import NeRFMLP
        from aonerf.ops import encoding, sampling
        from aonerf.ops.kernels import fused_render_level, mlp_params_from_flax

        o, d = _rays(8, seed=1)
        o32, d32 = jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)
        t_vals, coords = sampling.sample_along_rays(o32, d32, 8, 2.0, 6.0, False, False)
        xenc = encoding.pos_enc(coords, 0, 10)
        venc = encoding.pos_enc(d32, 0, 4)
        mlp = NeRFMLP()
        params = mlp.init(jax.random.PRNGKey(0), xenc, venc)
        kp = mlp_params_from_flax(params)
        comp, acc, depth, weights = fused_render_level(
            kp, t_vals, o32, d32, venc, xenc, True, ray_tile=4, interpret=True
        )

        np_p = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), params)["params"]
        raw_rgb, raw_sigma = oracles.nerf_mlp_np(
            np_p, np.asarray(xenc, np.float64), np.asarray(venc, np.float64)
        )
        want = oracles.volumetric_rendering_np(
            oracles._sigmoid(raw_rgb), np.maximum(raw_sigma, 0.0),
            np.asarray(t_vals, np.float64), d, True,
        )
        np.testing.assert_allclose(np.asarray(comp), want[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(acc), want[1], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(weights), want[2], rtol=2e-4, atol=2e-4)


class TestArticulatedPixelParity:
    """fp64-oracle parity for the deformation-MLP path (reference
    model_autodecoder.py:171-337): latent-conditioned warp, enc_after
    positional encoding, softplus sigma with bias, padded rgb — both the
    concat schedule and the latent_dense schedule must match the oracle."""

    def _setup(self, n_rays=10, n_coarse=6, n_fine=8, seed=3):
        from aonerf.models import ArticulatedNeRF

        o, d = _rays(n_rays, seed=seed)
        rng = np.random.default_rng(seed)
        latents = {
            "density": rng.standard_normal((1, 128)) * 0.1,
            "color": rng.standard_normal((1, 128)) * 0.1,
            "articulation": rng.standard_normal((1, 32)) * 0.1,
        }
        rays = {
            "rays_o": jnp.asarray(o, jnp.float32),
            "rays_d": jnp.asarray(d, jnp.float32),
            "viewdirs": jnp.asarray(d, jnp.float32),
        }
        lat32 = {k: jnp.asarray(v, jnp.float32) for k, v in latents.items()}
        model = ArticulatedNeRF(num_coarse_samples=n_coarse, num_fine_samples=n_fine)
        params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0, lat32)
        np_params = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float64), params
        )["params"]
        want = oracles.articulated_forward_np(
            np_params, latents, o, d, d, n_coarse, n_fine, 2.0, 6.0, True
        )
        return model, params, rays, lat32, want, (o, d, latents, n_coarse, n_fine)

    def _check(self, got, want):
        for level in range(2):
            np.testing.assert_allclose(
                np.asarray(got[level][0]), want[level][0], rtol=5e-4, atol=5e-4,
                err_msg=f"level {level} comp_rgb",
            )
            np.testing.assert_allclose(
                np.asarray(got[level][1]), want[level][1], rtol=5e-4, atol=5e-4,
                err_msg=f"level {level} acc",
            )

    def test_concat_schedule_matches_fp64_oracle(self):
        model, params, rays, lat, want, _ = self._setup()
        got = model.apply(params, rays, False, True, 2.0, 6.0, lat)
        self._check(got, want)

    def test_latent_dense_schedule_matches_fp64_oracle(self):
        from aonerf.models import ArticulatedNeRF

        model, params, rays, lat, want, (o, d, latents, nc, nf) = self._setup()
        model_ld = ArticulatedNeRF(
            num_coarse_samples=nc, num_fine_samples=nf, latent_dense=True
        )
        got = model_ld.apply(params, rays, False, True, 2.0, 6.0, lat)
        self._check(got, want)


_GRAD_SCRIPT = textwrap.dedent(
    """
    import os
    os.environ["JAX_ENABLE_X64"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import sys
    sys.path.insert(0, os.environ["AONERF_REPO"])
    from aonerf.models import NeRF
    from tests import oracles

    n_coarse, n_fine, n_rays = 4, 8, 6
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n_rays, 3)); d /= np.linalg.norm(d, -1, keepdims=True)
    o = -4.0 * d
    target = rng.uniform(size=(n_rays, 3))

    model = NeRF(num_coarse_samples=n_coarse, num_fine_samples=n_fine)
    rays = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d), "viewdirs": jnp.asarray(d)}
    params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0)

    def loss_fn(p):
        out = model.apply(p, rays, False, True, 2.0, 6.0)
        return (jnp.mean((out[0][0] - target) ** 2)
                + jnp.mean((out[1][0] - target) ** 2))

    np_params = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), params)["params"]

    # The fine sample POSITIONS are detached in the reference (helper.py:249)
    # and in aonerf (stop_gradient): jax.grad excludes their dependence on
    # coarse params. For the finite-difference oracle to measure the same
    # derivative, freeze the fine t-vals at their base-params values.
    base_out = oracles.nerf_forward_np(np_params, o, d, d, n_coarse, n_fine, 2.0, 6.0, True)
    t_coarse = np.broadcast_to(
        oracles.stratified_tvals_np(n_coarse, 2.0, 6.0), (n_rays, n_coarse + 1)
    )
    mids = 0.5 * (t_coarse[:, 1:] + t_coarse[:, :-1])
    u = np.broadcast_to(np.linspace(0.0, 1.0 - 2.0**-32, n_fine), (n_rays, n_fine))
    t_fine_fixed = np.sort(
        np.concatenate(
            [t_coarse, oracles.inverse_cdf_np(mids, base_out[0][2][:, 1:-1], u)],
            axis=-1,
        ),
        axis=-1,
    )

    def render_level_np(np_params, name, t):
        pts = o[:, None, :] + t[..., None] * d[:, None, :]
        xenc = oracles.pos_enc_np(pts, 0, 10)
        venc = oracles.pos_enc_np(d, 0, 4)
        raw_rgb, raw_sigma = oracles.nerf_mlp_np(np_params[name], xenc, venc)
        return oracles.volumetric_rendering_np(
            oracles._sigmoid(raw_rgb), np.maximum(raw_sigma, 0.0), t, d, True
        )[0]

    def loss_np(np_params):
        c = render_level_np(np_params, "coarse_mlp", t_coarse)
        f = render_level_np(np_params, "fine_mlp", t_fine_fixed)
        return np.mean((c - target) ** 2) + np.mean((f - target) ** 2)

    # Loss agreement: the model computes in f32 (its training dtype) while
    # the oracle runs fp64, so the gap is f32 rounding (~4e-8 relative on an
    # ~0.1 loss — measured 3.7e-9 absolute); real math errors are orders
    # louder. The substantive check is the finite-difference grads below.
    assert abs(loss_np(np_params) - float(loss_fn(params))) < 5e-8, (
        f"fp64 loss mismatch: {abs(loss_np(np_params) - float(loss_fn(params)))}")

    grads = jax.grad(loss_fn)(params)["params"]

    # central finite differences on sampled parameters of every layer group
    checked = 0
    rngc = np.random.default_rng(1)
    for mlp_name in ("coarse_mlp", "fine_mlp"):
        for layer in ("pts_0", "pts_5", "density", "bottleneck", "views_0", "rgb"):
            kern = np_params[mlp_name][layer]["kernel"]
            g = np.asarray(grads[mlp_name][layer]["kernel"])
            for _ in range(2):
                i = tuple(rngc.integers(0, s) for s in kern.shape)
                eps = 1e-5
                p_hi = {k: {kk: {a: vv.copy() for a, vv in lv.items()} for kk, lv in v.items()} for k, v in np_params.items()}
                p_lo = {k: {kk: {a: vv.copy() for a, vv in lv.items()} for kk, lv in v.items()} for k, v in np_params.items()}
                p_hi[mlp_name][layer]["kernel"][i] += eps
                p_lo[mlp_name][layer]["kernel"][i] -= eps
                fd = (loss_np(p_hi) - loss_np(p_lo)) / (2 * eps)
                ad = g[i]
                denom = max(abs(fd), abs(ad), 1e-8)
                assert abs(fd - ad) / denom < 5e-4, (
                    f"grad mismatch {mlp_name}/{layer}{i}: fd={fd} ad={ad}")
                checked += 1
    print(f"GRAD_PARITY_OK checked={checked}")
    """
)


_ART_GRAD_SCRIPT = textwrap.dedent(
    """
    import os
    os.environ["JAX_ENABLE_X64"] = "1"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import sys
    sys.path.insert(0, os.environ["AONERF_REPO"])
    from aonerf.models import ArticulatedNeRF
    from tests import oracles

    n_coarse, n_fine, n_rays = 4, 6, 5
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n_rays, 3)); d /= np.linalg.norm(d, -1, keepdims=True)
    o = -4.0 * d
    target = rng.uniform(size=(n_rays, 3))
    latents_np = {
        "density": rng.standard_normal((1, 128)) * 0.1,
        "color": rng.standard_normal((1, 128)) * 0.1,
        "articulation": rng.standard_normal((1, 32)) * 0.1,
    }

    # fp64 compute: the deformation-MLP path is deep enough that f32 rounding
    # in the backward pass reaches ~6e-4 relative on large latent grads —
    # louder than the 5e-4 parity bar. Params/latents hold the same values;
    # only the compute dtype is raised, so this still checks the same math.
    model = ArticulatedNeRF(num_coarse_samples=n_coarse, num_fine_samples=n_fine,
                            compute_dtype=jnp.float64)
    rays = {"rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d), "viewdirs": jnp.asarray(d)}
    lat = {k: jnp.asarray(v, jnp.float32) for k, v in latents_np.items()}
    params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0, lat)

    def loss_fn(p, l):
        out = model.apply(p, rays, False, True, 2.0, 6.0, l)
        return (jnp.mean((out[0][0] - target) ** 2)
                + jnp.mean((out[1][0] - target) ** 2))

    np_params = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), params)["params"]

    # Freeze the fine t-vals at their base values: the model detaches them
    # (reference helper.py:249), so finite differences must not see their
    # dependence on coarse params / latents.
    base = oracles.articulated_forward_np(
        np_params, latents_np, o, d, d, n_coarse, n_fine, 2.0, 6.0, True)
    t_coarse = np.broadcast_to(
        oracles.stratified_tvals_np(n_coarse, 2.0, 6.0), (n_rays, n_coarse + 1))
    mids = 0.5 * (t_coarse[:, 1:] + t_coarse[:, :-1])
    u = np.broadcast_to(np.linspace(0.0, 1.0 - 2.0**-32, n_fine), (n_rays, n_fine))
    t_fine_fixed = np.sort(
        np.concatenate(
            [t_coarse, oracles.inverse_cdf_np(mids, base[0][2][:, 1:-1], u)], axis=-1),
        axis=-1)

    def render_level_np(np_params, lat_np, name, t):
        pts = o[:, None, :] + t[..., None] * d[:, None, :]
        venc = oracles.pos_enc_np(d, 0, 4)
        raw_rgb, raw_sigma = oracles.articulated_mlp_np(np_params[name], pts, venc, lat_np)
        rgb = oracles._sigmoid(raw_rgb) * 1.002 - 0.001
        sigma = oracles._softplus(raw_sigma - 1.0)
        return oracles.volumetric_rendering_np(rgb, sigma, t, d, True)[0]

    def loss_np(np_params, lat_np):
        c = render_level_np(np_params, lat_np, "coarse_mlp", t_coarse)
        f = render_level_np(np_params, lat_np, "fine_mlp", t_fine_fixed)
        return np.mean((c - target) ** 2) + np.mean((f - target) ** 2)

    assert abs(loss_np(np_params, latents_np) - float(loss_fn(params, lat))) < 1e-7

    grads_p, grads_l = jax.grad(loss_fn, argnums=(0, 1))(params, lat)
    grads_p = grads_p["params"]

    import copy
    checked = 0
    rngc = np.random.default_rng(1)
    # eps=1e-6: the latent->sigma path has high curvature (the integrator's
    # 1e10 tail delta), and at eps=1e-5 FD truncation alone reaches 6e-4
    # relative; measured convergence: 1e-5 -> 5.8e-4, 1e-6 -> 7e-6,
    # 1e-7 -> 4e-7 (clean O(eps^2) toward the AD value).
    eps = 1e-6
    for mlp_name in ("coarse_mlp", "fine_mlp"):
        for layer in ("deform_0", "deform_out", "pts_0", "pts_5", "density",
                      "bottleneck", "views_0", "rgb"):
            kern = np_params[mlp_name][layer]["kernel"]
            g = np.asarray(grads_p[mlp_name][layer]["kernel"])
            for _ in range(2):
                i = tuple(rngc.integers(0, s) for s in kern.shape)
                p_hi = copy.deepcopy(np_params); p_lo = copy.deepcopy(np_params)
                p_hi[mlp_name][layer]["kernel"][i] += eps
                p_lo[mlp_name][layer]["kernel"][i] -= eps
                fd = (loss_np(p_hi, latents_np) - loss_np(p_lo, latents_np)) / (2 * eps)
                ad = g[i]
                # 1e-6 floor: at |grad| ~ 1e-7 the central-difference noise
                # (~1e-10 absolute) dominates the relative comparison
                denom = max(abs(fd), abs(ad), 1e-6)
                assert abs(fd - ad) / denom < 5e-4, (
                    f"grad mismatch {mlp_name}/{layer}{i}: fd={fd} ad={ad}")
                checked += 1
    # latent-code gradients (the quantities the auto-decoder trains)
    for code in ("density", "color", "articulation"):
        g = np.asarray(grads_l[code]).reshape(-1)
        for _ in range(3):
            i = int(rngc.integers(0, g.shape[0]))
            l_hi = copy.deepcopy(latents_np); l_lo = copy.deepcopy(latents_np)
            l_hi[code].reshape(-1)[i] += eps
            l_lo[code].reshape(-1)[i] -= eps
            fd = (loss_np(np_params, l_hi) - loss_np(np_params, l_lo)) / (2 * eps)
            ad = g[i]
            denom = max(abs(fd), abs(ad), 1e-6)
            assert abs(fd - ad) / denom < 5e-4, (
                f"latent grad mismatch {code}[{i}]: fd={fd} ad={ad}")
            checked += 1
    print(f"ART_GRAD_PARITY_OK checked={checked}")
    """
)


def _run_grad_script(tmp_path, text, token):
    script = tmp_path / "grad_parity.py"
    script.write_text(text)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.update(AONERF_REPO=repo, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, str(script)], env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert token in result.stdout


@pytest.mark.slow
class TestGradientParity:
    def test_grads_match_finite_differences(self, tmp_path):
        """jax.grad (x64) vs central finite differences of the fp64 oracle."""
        _run_grad_script(tmp_path, _GRAD_SCRIPT, "GRAD_PARITY_OK")

    def test_articulated_grads_match_finite_differences(self, tmp_path):
        """Same harness for the deformation-MLP path: model params of every
        layer group AND the latent codes themselves (the auto-decoder's
        trainable codes) vs finite differences of the articulated oracle."""
        _run_grad_script(tmp_path, _ART_GRAD_SCRIPT, "ART_GRAD_PARITY_OK")
