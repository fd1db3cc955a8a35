"""Orbax checkpointing: params + opt state + step, best-PSNR retention.

Replaces the reference's Lightning ModelCheckpoint (run.py:38-71: monitor
val/psnr mode max, save_top_k, save_last) and its state-dict surgery helpers
(utils/__init__.py:117-146: partial load, prefix strip, latent-code-only
load) with Orbax equivalents on pytrees.
"""

import os
from typing import Any, Optional

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


def load_params_subtree(state: Any, restored: Any, subtree: str) -> Any:
    """Checkpoint surgery: graft one params subtree (e.g. 'codes' — the
    reference's load_latent_codes, utils/__init__.py:143-146) from a restored
    state into a fresh one."""
    params = dict(state.params)
    params[subtree] = restored.params[subtree]
    return state.replace(params=params)
