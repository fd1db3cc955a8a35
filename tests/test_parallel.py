"""Multi-device tests on the 8-way virtual CPU mesh: sharded train step
equivalence with single-device execution, and tp sharding compiles."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aonerf.models import NeRF
from aonerf.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_params,
    tp_param_spec,
)
from aonerf.train import create_train_state, make_adam, make_vanilla_train_step


def _buffers(n=256, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray((-4.0 * d).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "viewdirs": jnp.asarray(d),
        "target": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
    }


class TestMesh:
    def test_make_mesh_shapes(self, devices):
        mesh = make_mesh()
        assert mesh.shape["data"] == len(jax.devices())
        mesh2 = make_mesh(n_data=4, n_model=2)
        assert mesh2.shape == {"data": 4, "model": 2}

    def test_shard_batch_layouts(self, devices):
        mesh = make_mesh()
        batch = {
            "rays_o": np.zeros((64, 3), np.float32),
            "instance_id": np.int32(1),
        }
        placed = shard_batch(mesh, batch)
        assert placed["rays_o"].sharding.spec == P("data")
        assert placed["instance_id"].sharding.spec == P()

    def test_tp_param_spec(self):
        params = {
            "params": {
                "pts_0": {"kernel": np.zeros((63, 256)), "bias": np.zeros((256,))},
                "density": {"kernel": np.zeros((256, 1)), "bias": np.zeros((1,))},
            }
        }
        spec = tp_param_spec(params, n_model=2)
        assert spec["params"]["pts_0"]["kernel"] == P(None, "model")
        assert spec["params"]["pts_0"]["bias"] == P()
        assert spec["params"]["density"]["kernel"] == P()


class TestShardedTraining:
    def test_dp_matches_single_device(self, devices):
        """The sharded step (rays over 8 devices, params replicated) must
        agree with the unsharded step — XLA's psum is the only difference."""
        model = NeRF(num_coarse_samples=4, num_fine_samples=4)
        buf = _buffers(256)
        dummy = {k: v[:8] for k, v in buf.items()}
        params = model.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0)
        tx = make_adam(lr_init=1e-3, lr_delay_steps=0)
        step = make_vanilla_train_step(
            model, tx, white_bkgd=True, near=2.0, far=6.0, batch_size=64, donate=False
        )
        key = jax.random.PRNGKey(3)

        # single device
        state1 = create_train_state(params, tx)
        state1, m1 = step(state1, buf, key)

        # 8-device mesh: replicate params, shard ray buffers
        mesh = make_mesh()
        buf_sh = shard_batch(mesh, buf)
        params_sh = shard_params(mesh, params)
        state2 = create_train_state(params_sh, tx)
        state2 = jax.device_put(state2, replicated_sharding(mesh))
        state2, m2 = step(state2, buf_sh, jax.device_put(key, replicated_sharding(mesh)))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        l1 = jax.tree_util.tree_leaves(state1.params)
        l2 = jax.tree_util.tree_leaves(state2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)

    def test_tp_forward_matches(self, devices):
        """MLP-width tensor parallelism (4 data x 2 model) returns the same
        pixels as replicated execution."""
        model = NeRF(num_coarse_samples=4, num_fine_samples=4)
        buf = _buffers(64)
        rays = {k: buf[k] for k in ("rays_o", "rays_d", "viewdirs")}
        params = model.init(jax.random.PRNGKey(0), rays, False, True, 2.0, 6.0)

        fwd = jax.jit(lambda p, r: model.apply(p, r, False, True, 2.0, 6.0))
        out_ref = fwd(params, rays)

        mesh = make_mesh(n_data=4, n_model=2)
        params_tp = shard_params(mesh, params, tp=True)
        rays_sh = shard_batch(mesh, rays)
        out_tp = fwd(params_tp, rays_sh)
        np.testing.assert_allclose(
            np.asarray(out_ref[1][0]), np.asarray(out_tp[1][0]), rtol=1e-4, atol=1e-5
        )
