"""Metric logging: JSONL stream + console, wandb-gated.

Replaces the reference's WandbLogger scalar streams (run.py:75;
model.py:278-280). wandb is used when importable AND WANDB_API_KEY is set;
otherwise every scalar lands in {run_dir}/metrics.jsonl so runs are always
inspectable offline.
"""

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, run_dir: str, use_wandb: bool = False, project: str = "aonerf"):
        os.makedirs(run_dir, exist_ok=True)
        self._path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self._path, "a", buffering=1)
        self._wandb = None
        if use_wandb and os.environ.get("WANDB_API_KEY"):
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, dir=run_dir)
            except ImportError:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: Optional[str] = None) -> None:
        flat = {
            (f"{prefix}/{k}" if prefix else k): float(v) for k, v in metrics.items()
        }
        self._f.write(json.dumps({"step": int(step), "t": time.time(), **flat}) + "\n")
        if self._wandb is not None:
            self._wandb.log(flat, step=int(step))

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
