"""2-process jax.distributed worker: one autodecoder DDP step with
VIEW-SHARDED scene buffers spanning the two processes, asserted against the
single-device local-slice oracle (the production configuration of the
reference's 7-GPU articulated runs, README.md:105 — each GPU holds part of
the data and grads cross a real process boundary).

Launched by tests/test_parallel.py::TestMultiHost::
test_autodecoder_sharded_step_two_processes; not a pytest module.
Usage: python worker_autodecoder_2proc.py <process_id> <port> <repo_root>
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

from aonerf.models import ArticulatedNeRF, CodeLibraryArticulated
from aonerf.parallel import make_mesh, replicated_sharding, shard_multi_buffers
from aonerf.train import create_train_state
from aonerf.train.step import (
    _autodecoder_loss_fn,
    make_autodecoder_device_train_step,
    sample_multi_batch,
)

assert jax.process_count() == 2 and jax.device_count() == 2

# tiny rectangular multi-config buffers (the SapienMultiDataset
# device_buffers schema), n_v=4 -> 2 views per process when view-sharded
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

model = ArticulatedNeRF(num_coarse_samples=4, num_fine_samples=4)
lib = CodeLibraryArticulated(n_max_objs=2)
batch_size = 16
lib_params = lib.init(jax.random.PRNGKey(1), jnp.asarray(0), jnp.asarray(0))
latents = lib.apply(lib_params, jnp.asarray(0), jnp.asarray(0))
latents = {k: jnp.atleast_2d(v) for k, v in latents.items()}
host_buf = {k: jnp.asarray(v) for k, v in buffers.items()}
dummy = sample_multi_batch(host_buf, jax.random.PRNGKey(0), batch_size)
model_params = model.init(jax.random.PRNGKey(0), dummy, False, True, 2.0, 6.0, latents)
params = {"model": model_params, "codes": lib_params}
tx = optax.sgd(1e-2)  # linear in grads: oracle comparison is exact-ish
base_key = jax.random.PRNGKey(13)

# --- cross-process sharded step: 2-device mesh, one device per process,
# buffers view-sharded over 'data' (each PROCESS holds half the views)
mesh = make_mesh()
step = make_autodecoder_device_train_step(
    model, lib, tx, white_bkgd=True, near=2.0, far=6.0,
    batch_size=batch_size, donate=False, mesh=mesh, sharded_views=True,
)
state = jax.device_put(create_train_state(params, tx), replicated_sharding(mesh))
buf_sh = shard_multi_buffers(mesh, buffers)
for k in ("rgb", "mask", "c2w"):
    assert len(buf_sh[k].addressable_shards) == 1  # this process: its slice only
    assert buf_sh[k].addressable_shards[0].data.shape[2] == n_v // 2
gkey = jax.device_put(base_key, replicated_sharding(mesh))
state2, m = step(state, buf_sh, gkey)
loss_sh = float(m["loss"])

# --- single-device local-slice oracle (each process computes the SAME full
# replay from its replica of params + host copy of all buffers): chip d
# samples from views [d*2:(d+1)*2] with the fold_in(key, d) stream
loss_fn = _autodecoder_loss_fn(model, lib, True, 2.0, 6.0, True, 1e-4)
key = jax.random.fold_in(base_key, 0)  # state.step == 0
local_v = n_v // 2
losses, grads_acc = [], None
for d in range(2):
    kd = jax.random.fold_in(key, d)
    sample_key, render_key = jax.random.split(kd)
    local = {
        k: (v[:, :, d * local_v : (d + 1) * local_v]
            if k in ("rgb", "mask", "c2w") else v)
        for k, v in host_buf.items()
    }
    batch = sample_multi_batch(local, sample_key, batch_size)
    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, render_key
    )
    losses.append(float(loss))
    grads_acc = grads if grads_acc is None else jax.tree_util.tree_map(
        jnp.add, grads_acc, grads
    )
grads_mean = jax.tree_util.tree_map(lambda g: g / 2, grads_acc)
updates, _ = tx.update(grads_mean, tx.init(params), params)
want_params = optax.apply_updates(params, updates)

assert abs(loss_sh - float(np.mean(losses))) < 1e-4 * max(1.0, abs(loss_sh)), (
    loss_sh, losses
)
for a, b in zip(
    jax.tree_util.tree_leaves(state2.params),
    jax.tree_util.tree_leaves(want_params),
):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)
print(f"proc{pid} adddp ok loss={loss_sh:.5f}")
