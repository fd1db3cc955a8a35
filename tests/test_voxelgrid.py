"""Tests for aonerf.viz.voxelgrid — field-density occupancy extraction
(the TPU-native analogue of visualize_nerf/vis_voxel_grid.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from aonerf.models import ArticulatedNeRF, NeRF
from aonerf.viz import voxelgrid as vg


def _rays(n=4, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = (-4.0 * d).astype(np.float32)
    return {
        "rays_o": jnp.asarray(o),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
    }


def _latents(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "density": jnp.asarray(rng.standard_normal((1, 128)), dtype=jnp.float32),
        "color": jnp.asarray(rng.standard_normal((1, 128)), dtype=jnp.float32),
        "articulation": jnp.asarray(rng.standard_normal((1, 32)), dtype=jnp.float32),
    }


def _sphere_density(radius=0.5, sigma=50.0):
    def fn(points):
        return jnp.where(jnp.linalg.norm(points, axis=-1) < radius, sigma, 0.0)

    return fn


class TestDensityGrid:
    def test_sphere_grid_center_vs_corner(self):
        grid = vg.density_grid(_sphere_density(), resolution=16)
        assert grid.shape == (16, 16, 16)
        assert grid[8, 8, 8] == 50.0  # voxel nearest the origin
        assert grid[0, 0, 0] == 0.0

    def test_grid_axis_indexing(self):
        # Density depends on x ONLY: pins [ix, iy, iz] indexing and the
        # z-slab moveaxis in density_grid.
        grid = vg.density_grid(
            lambda p: jnp.where(p[..., 0] > 0, 7.0, 0.0), resolution=8
        )
        assert (grid[4:] == 7.0).all() and (grid[:4] == 0.0).all()

    def test_occupied_points_inside_sphere(self):
        res, radius = 32, 0.5
        grid = vg.density_grid(_sphere_density(radius), resolution=res)
        pts = vg.occupied_points(grid, threshold=10.0)
        assert len(pts) == int((grid > 10.0).sum()) > 0
        pitch = 3.0 / res  # bbox extent 3, so voxel centers stay in-sphere
        assert (np.linalg.norm(pts, axis=-1) < radius + pitch).all()

    def test_export_ply_counts(self, tmp_path):
        path, count = vg.export_occupancy_ply(
            str(tmp_path / "occ.ply"), _sphere_density(), resolution=16
        )
        text = open(path).read()
        n_vert = int(
            [l for l in text.splitlines() if l.startswith("element vertex")][0].split()[-1]
        )
        assert n_vert == count > 0


class TestModelAdapters:
    def test_nerf_density_matches_fine_mlp(self):
        model = NeRF(num_coarse_samples=4, num_fine_samples=8)
        variables = model.init(jax.random.PRNGKey(0), _rays(), False, True, 2.0, 6.0)
        fn = vg.nerf_density_fn(model, variables)
        pts = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (3, 5, 3)), jnp.float32)
        sigma = np.asarray(fn(pts))
        assert sigma.shape == (3, 5)
        assert np.isfinite(sigma).all() and (sigma >= 0).all()

    def test_ae_density_from_encoded_latents(self):
        from aonerf.models.ae import AutoEncoderArticulatedNeRF

        model = AutoEncoderArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
        rng = np.random.default_rng(0)
        d = rng.standard_normal((8, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        batch = {
            "rays_o": jnp.asarray(-4.0 * d),
            "rays_d": jnp.asarray(d),
            "viewdirs": jnp.asarray(d),
        }
        src = jnp.asarray(rng.uniform(-1, 1, (3, 24, 32)).astype(np.float32))
        deg = jnp.asarray(np.float32(np.deg2rad(40.0)))
        params = model.init(
            jax.random.PRNGKey(0), batch, src[None], deg, False, True, 2.0, 6.0
        )

        def latents_from(img):
            lat = model.apply(params, img[None], method=model.encode)
            lat = dict(lat)
            lat["articulation_deg"] = model.apply(params, deg, method=model.deg_code)
            return {k: jnp.atleast_2d(v) for k, v in lat.items()}

        lat = latents_from(src)
        grid1 = vg.density_grid(vg.ae_density_fn(model, params, lat), resolution=8)
        assert np.isfinite(grid1).all() and (grid1 >= 0).all()
        # the field is really conditioned on the encoded shape code
        # (a fresh random ENCODER input barely moves the code at init, so
        # perturb the latent itself)
        lat2 = dict(lat, density=lat["density"] + 2.0)
        grid2 = vg.density_grid(vg.ae_density_fn(model, params, lat2), resolution=8)
        assert not np.allclose(grid1, grid2)

    def test_articulated_density_responds_to_articulation_code(self):
        model = ArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
        lat = _latents()
        variables = model.init(
            jax.random.PRNGKey(0), _rays(), False, True, 2.0, 6.0, lat
        )
        grid1 = vg.density_grid(
            vg.articulated_density_fn(model, variables, lat), resolution=8
        )
        assert np.isfinite(grid1).all() and (grid1 >= 0).all()
        lat2 = dict(lat, articulation=lat["articulation"] + 2.0)
        grid2 = vg.density_grid(
            vg.articulated_density_fn(model, variables, lat2), resolution=8
        )
        assert not np.allclose(grid1, grid2)
