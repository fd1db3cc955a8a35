"""2-process jax.distributed worker: one auto-encoder DDP step with
VIEW-SHARDED scene buffers spanning the two processes — each process
samples AND ResNet-encodes a source view from its own half of the data,
grads pmean across the process boundary — asserted against the jitted
local-slice oracle (same standard as tests/test_parallel.py::
TestShardedSceneBuffers::test_ae_sharded_step_matches_local_slice_oracle).

Launched by tests/test_parallel.py::TestMultiHost::
test_ae_sharded_step_two_processes; not a pytest module.
Usage: python worker_ae_2proc.py <process_id> <port> <repo_root>
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

pid, port, repo = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
sys.path.insert(0, repo)

import jax.numpy as jnp
import optax

from aonerf.models.ae import AutoEncoderArticulatedNeRF
from aonerf.parallel import make_mesh, replicated_sharding, shard_multi_buffers
from aonerf.train import create_train_state
from aonerf.train.step import sample_multi_batch
from aonerf.train.step_ae import _ae_loss_fn, make_ae_device_train_step

assert jax.process_count() == 2 and jax.device_count() == 2

h, w, n_i, n_d, n_v = 12, 16, 2, 2, 4
rng = np.random.default_rng(3)
hw = h * w
c2w = np.tile(np.eye(3, 4, dtype=np.float32), (n_i, n_d, n_v, 1, 1))
c2w[..., 2, 3] = 4.0
dirs = rng.standard_normal((hw, 3)).astype(np.float32)
dirs[:, 2] = -np.abs(dirs[:, 2]) - 0.5
buffers = {
    "rgb": rng.integers(0, 255, (n_i, n_d, n_v, hw, 3), dtype=np.uint8),
    "mask": rng.integers(0, 2, (n_i, n_d, n_v, hw)).astype(np.uint8),
    "c2w": c2w,
    "directions": dirs,
    "deg": np.deg2rad(np.arange(n_d) * 45.0).astype(np.float32),
}

model = AutoEncoderArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
batch_size = 8
host_buf = {k: jnp.asarray(v) for k, v in buffers.items()}
dummy = sample_multi_batch(host_buf, jax.random.PRNGKey(0), batch_size, src_hw=(h, w))
params = model.init(
    jax.random.PRNGKey(0), dummy, dummy["src_imgs"][None], dummy["deg"],
    False, True, 2.0, 6.0,
)
tx = optax.sgd(1e-2)
base_key = jax.random.PRNGKey(17)

mesh = make_mesh()
step = make_ae_device_train_step(
    model, tx, white_bkgd=True, near=2.0, far=6.0, img_wh=(w, h),
    batch_size=batch_size, donate=False, mesh=mesh, sharded_views=True,
)
state = jax.device_put(create_train_state(params, tx), replicated_sharding(mesh))
buf_sh = shard_multi_buffers(mesh, buffers)
for k in ("rgb", "mask", "c2w"):
    assert len(buf_sh[k].addressable_shards) == 1
    assert buf_sh[k].addressable_shards[0].data.shape[2] == n_v // 2
gkey = jax.device_put(base_key, replicated_sharding(mesh))
state2, m = step(state, buf_sh, gkey)
loss_sh = float(m["loss"])

# jitted local-slice oracle (eager conv backward diverges measurably from
# the compiled program — same rationale as the 8-device AE oracle test)
loss_fn = _ae_loss_fn(model, True, 2.0, 6.0, True, 0.5)
local_v = n_v // 2


def replay(params, base_key):
    key = jax.random.fold_in(base_key, 0)
    losses, grads_acc = [], None
    for d in range(2):
        kd = jax.random.fold_in(key, d)
        sample_key, render_key = jax.random.split(kd)
        local = {
            k: (v[:, :, d * local_v : (d + 1) * local_v]
                if k in ("rgb", "mask", "c2w") else v)
            for k, v in host_buf.items()
        }
        batch = sample_multi_batch(local, sample_key, batch_size, src_hw=(h, w))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, render_key
        )
        losses.append(loss)
        grads_acc = grads if grads_acc is None else jax.tree_util.tree_map(
            jnp.add, grads_acc, grads
        )
    gm = jax.tree_util.tree_map(lambda g: g / 2, grads_acc)
    up, _ = tx.update(gm, tx.init(params), params)
    return optax.apply_updates(params, up), jnp.mean(jnp.stack(losses))


want_params, want_loss = jax.jit(replay)(params, base_key)
assert abs(loss_sh - float(want_loss)) < 1e-4 * max(1.0, abs(loss_sh))
for a, b in zip(
    jax.tree_util.tree_leaves(state2.params),
    jax.tree_util.tree_leaves(want_params),
):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-5)
print(f"proc{pid} aeddp ok loss={loss_sh:.5f}")
