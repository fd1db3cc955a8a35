"""Scalar loss/metric math.

Reference parity: models/vanilla_nerf/helper.py:17-22 (img2mse, mse2psnr).
"""

import jax.numpy as jnp
import numpy as np


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error over all elements."""
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB from an MSE value (natural-log formulation, as reference)."""
    return -10.0 * jnp.log(mse) / np.log(10.0)
