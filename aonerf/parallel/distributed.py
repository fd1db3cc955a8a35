"""Multi-host initialization and cross-process collection helpers.

The reference's multi-GPU story is single-node DDP (run.py:109-153, NCCL);
its rank plumbing is `dist.get_rank()` gating and Lightning `all_gather` for
eval collation (models/interface.py:31-51). The TPU-native equivalents:

  initialize()          -> jax.distributed.initialize() (idempotent): gives
                           every host the same global device list, so the
                           meshes from aonerf.parallel.make_mesh span the pod
                           slice (ICI within host, DCN across hosts)
  is_main_process()     -> process_index() == 0 (the reference's rank-0 gate)
  gather_images()       -> per-host rendered ray tiles -> full images on every
                           host (the reference's alter_gather_cat)

With a pod mesh, the jitted train step needs NO code changes: rays shard over
'data' across all chips, XLA emits the psum over ICI+DCN.
"""

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np


_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize. No-ops single-process (the
    common case in tests and single-host runs)."""
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    if coordinator_address is None and num_processes is None:
        # single-process run (or env-configured TPU pod: jax auto-detects)
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            pass  # not a distributed environment
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True


def is_main_process() -> bool:
    """The reference's rank-0 gate (model_autodecoder.py:575-580)."""
    return jax.process_index() == 0


def local_shard_bounds(n: int) -> tuple:
    """[start, stop) of this process's contiguous shard of n items."""
    per = -(-n // jax.process_count())
    start = jax.process_index() * per
    return start, min(start + per, n)


def gather_images(
    local_rows: np.ndarray, total_rows: int
) -> np.ndarray:
    """All-gather per-row eval outputs across processes and trim padding —
    the reference's alter_gather_cat (interface.py:31-51). ``local_rows`` is
    this process's contiguous shard (rows [start, stop) from
    local_shard_bounds(total_rows)); ragged last shards are zero-padded to
    the common per-process count before the gather, and the reassembled
    array is trimmed to ``total_rows``. Identity (plus trim) on one
    process."""
    local_rows = np.asarray(local_rows)
    if jax.process_count() == 1:
        return local_rows[:total_rows]
    from jax.experimental import multihost_utils

    per = -(-total_rows // jax.process_count())
    if local_rows.shape[0] < per:  # ragged last shard: pad for equal shapes
        pad = np.zeros((per - local_rows.shape[0], *local_rows.shape[1:]),
                       local_rows.dtype)
        local_rows = np.concatenate([local_rows, pad], axis=0)
    gathered = multihost_utils.process_allgather(local_rows)
    return np.asarray(gathered).reshape(-1, *local_rows.shape[1:])[:total_rows]
