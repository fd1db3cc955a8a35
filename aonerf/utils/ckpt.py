"""Orbax checkpointing: params + opt state + step, best-PSNR retention.

Replaces the reference's Lightning ModelCheckpoint (run.py:38-71: monitor
val/psnr mode max, save_top_k, save_last) and its state-dict surgery helpers
(utils/__init__.py:117-146: partial load, prefix strip, latent-code-only
load) with Orbax equivalents on pytrees.
"""

import os
from typing import Any, Optional, Sequence

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Top-k-by-PSNR + always-keep-latest checkpointing of a TrainState."""

    def __init__(self, directory: str, keep: int = 5):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            best_fn=lambda metrics: metrics.get("val_psnr", float("-inf")),
            best_mode="max",
            keep_checkpoints_without_metrics=True,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, state: Any, val_psnr: Optional[float] = None) -> None:
        metrics = {"val_psnr": float(val_psnr)} if val_psnr is not None else None
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_like`` (same pytree shape)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def close(self) -> None:
        self._mgr.close()


def _flatten_paths(tree: Any):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {
        "/".join(
            str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
            for k in path
        ): leaf
        for path, leaf in flat
    }


def load_partial(
    params: Any,
    restored_params: Any,
    prefixes_to_ignore: Sequence[str] = (),
) -> Any:
    """Non-strict checkpoint surgery on pytrees: copy every restored leaf
    whose path exists in ``params`` with a matching shape, skip paths under
    any of ``prefixes_to_ignore``, and leave everything else untouched.

    Reference parity: utils/__init__.py:117-141 (`extract_model_state_dict`
    + `load_ckpt` — non-strict state-dict load with prefix ignore; mismatched
    or missing keys are skipped with a note, not an error).
    """
    target = _flatten_paths(params)
    source = _flatten_paths(restored_params)
    taken = {}
    for path, leaf in source.items():
        if any(path.startswith(p) for p in prefixes_to_ignore):
            continue
        if path in target and getattr(target[path], "shape", None) == getattr(
            leaf, "shape", None
        ):
            taken[path] = leaf
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(
            str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
            for k in path
        )
        new_leaves.append(taken.get(key, leaf))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_params_subtree(state: Any, restored: Any, subtree: str) -> Any:
    """Checkpoint surgery: graft one params subtree (e.g. 'codes' — the
    reference's load_latent_codes, utils/__init__.py:143-146) from a restored
    state into a fresh one."""
    params = dict(state.params)
    params[subtree] = restored.params[subtree]
    return state.replace(params=params)
