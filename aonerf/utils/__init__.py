"""Utilities: configs, checkpointing, logging."""

from aonerf.utils.config import Config, load_config  # noqa: F401
from aonerf.utils.ckpt import CheckpointManager  # noqa: F401
from aonerf.utils.logging import MetricLogger  # noqa: F401
