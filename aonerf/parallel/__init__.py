"""Device meshes and sharding specs (the reference's DDP/NCCL equivalent)."""

from aonerf.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    multi_buffer_specs,
    replicated_sharding,
    shard_batch,
    shard_multi_buffers,
    shard_params,
    tp_param_spec,
)
