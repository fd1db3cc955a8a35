"""Device meshes and sharding specs (the reference's DDP/NCCL equivalent)."""

from aonerf.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_params,
    tp_param_spec,
)
