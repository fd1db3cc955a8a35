"""Pallas TPU kernels for the rendering hot path."""

from aonerf.ops.kernels.fused_render import fused_render_level, mlp_params_from_flax  # noqa: F401
