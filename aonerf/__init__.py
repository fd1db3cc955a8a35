"""aonerf — TPU-native articulated-object NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
DJNing/articulated-object-nerf (see SURVEY.md): vanilla NeRF overfitting,
auto-decoder articulated NeRF with a learned code library + deformation MLP,
and an auto-encoder variant conditioned by a multi-head ResNet image encoder.

Layout:
  aonerf.ops       pure rendering math (rays, sampling, encoding, integrator)
  aonerf.ops.kernels  Pallas TPU kernels for the hot path
  aonerf.models    Flax neural fields (NeRF MLPs, code library, encoders)
  aonerf.parallel  device meshes + sharding specs (dp/tp over ICI/DCN)
  aonerf.data      SAPIEN dataset loaders + synthetic datagen
  aonerf.train     jitted train steps, LR schedules, losses, loop
  aonerf.eval      metrics (PSNR/SSIM/LPIPS), tiled rendering, IO
  aonerf.utils     configs, checkpointing, logging
"""

__version__ = "0.1.0"
