"""Mesh construction + sharding specs for dp (rays) and optional tp (MLP width).

TPU-native replacement for the reference's only distribution strategy —
Lightning DDPPlugin over NCCL (run.py:8,109-153): the ray batch is sharded
over the ``data`` mesh axis and parameters are replicated; XLA then emits the
gradient all-reduce (psum over ICI/DCN) inside the jitted train step,
overlapped with the backward pass. An optional ``model`` axis shards the NeRF
MLP's 256-wide hidden layers (tensor parallelism) — unnecessary at this model
size but wired through so wider fields scale.

Multi-host: ``jax.distributed.initialize()`` before calling make_mesh gives a
global mesh; ``data`` should span ICI within a host and DCN across hosts
(mesh axes are constructed from ``jax.devices()`` which already orders
devices host-major).
"""

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with axes ('data', 'model'). Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        devices = devices[: n_data * n_model]
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Rays (leading axis) sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place a batch dict on the mesh: per-ray arrays sharded over 'data',
    scalars/ids replicated."""
    ray_sh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] >= mesh.shape["data"] and x.shape[0] % mesh.shape["data"] == 0:
            return jax.device_put(x, ray_sh)
        return jax.device_put(x, rep)

    return {k: place(v) for k, v in batch.items()}


def tp_param_spec(params: Any, n_model: int, min_width: int = 128) -> Any:
    """PartitionSpec pytree for tensor parallelism: Dense kernels have their
    width-``min_width``+ output dim sharded over 'model'; everything else is
    replicated. XLA's sharding propagation inserts the activation collectives.
    """

    def spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (
            name == "kernel"
            and leaf.ndim == 2
            and leaf.shape[1] >= min_width
            and leaf.shape[1] % n_model == 0
        ):
            return P(None, "model")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(mesh: Mesh, params: Any, tp: bool = False) -> Any:
    """Place a parameter pytree on the mesh: replicated (dp) or tp-sharded."""
    if not tp or mesh.shape["model"] == 1:
        return jax.device_put(params, replicated_sharding(mesh))
    specs = tp_param_spec(params, mesh.shape["model"])
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
