"""LPIPS (VGG16 variant) in jnp, parameterized by an external weights file.

The reference computes LPIPS through piqa (models/interface.py:113-123),
whose pretrained VGG16 + linear-head weights cannot be downloaded in this
environment. This module implements the full forward pass; supply an ``.npz``
with keys:
  features_{i}_kernel / features_{i}_bias  — VGG16 conv kernels (HWIO), for
    i in the torchvision feature indices (0,2,5,7,10,12,14,17,19,21,24,26,28)
  lin_{j}_kernel — the 5 LPIPS 1x1 linear heads, j in 0..4
"""

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 .features conv indices and the relu taps LPIPS uses.
_CONV_IDXS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_POOL_AFTER = {2, 7, 14, 21}  # maxpool after the relu at these conv indices
_TAPS = {2, 7, 14, 21, 28}  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return out + bias


def _vgg_features(params: Dict[str, np.ndarray], x: jnp.ndarray) -> List[jnp.ndarray]:
    feats = []
    for idx in _CONV_IDXS:
        x = _conv(x, params[f"features_{idx}_kernel"], params[f"features_{idx}_bias"])
        x = jax.nn.relu(x)
        if idx in _TAPS:
            feats.append(x)
        if idx in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def lpips_from_npz(weights_path: str, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance between two (H, W, 3) images in [0, 1]."""
    params = {k: jnp.asarray(v) for k, v in np.load(weights_path).items()}

    def prep(img):
        img = img.astype(jnp.float32) * 2.0 - 1.0  # [-1, 1]
        img = (img - _SHIFT) / _SCALE
        return img[None]  # NHWC

    fx = _vgg_features(params, prep(pred))
    fy = _vgg_features(params, prep(target))
    total = 0.0
    for j, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
        diff = (a - b) ** 2
        w = params[f"lin_{j}_kernel"].reshape(1, 1, 1, -1)
        total = total + jnp.mean(jnp.sum(diff * w, axis=-1))
    return total
