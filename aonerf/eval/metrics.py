"""Image quality metrics: PSNR, SSIM, (gated) LPIPS, object-masked PSNR.

Reference parity: models/interface.py:53-171 (psnr/ssim/lpips + per-image and
legacy variants; split-dict summaries) and models/utils.py:102-109 (object
pixels from segmentation masks for object PSNR).

SSIM follows the standard Wang et al. formulation with an 11x11 Gaussian
window (sigma 1.5), k1=0.01, k2=0.03 on [0,1] images — the same defaults as
the piqa.SSIM the reference uses. LPIPS requires pretrained VGG features the
zero-egress image does not ship; ``lpips_image`` computes them when a weights
file is provided and returns NaN otherwise (capability gated, not dropped).
"""

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def psnr_image(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """PSNR of one image (any shape), base-10 dB."""
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log(mse) / np.log(10.0)


def masked_psnr(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """PSNR over foreground pixels only (object PSNR)."""
    m = mask.reshape(-1).astype(jnp.float32)
    p = pred.reshape(-1, pred.shape[-1])
    t = target.reshape(-1, target.shape[-1])
    num = jnp.sum(m[:, None] * (p - t) ** 2)
    den = jnp.maximum(jnp.sum(m) * p.shape[-1], 1.0)
    return -10.0 * jnp.log(num / den) / np.log(10.0)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim_image(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    max_val: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """SSIM of one (H, W, C) image pair, mean over pixels and channels."""
    kern = _gaussian_kernel(kernel_size, sigma)[..., None, None]  # (k,k,1,1)

    def filt(img):
        # depthwise valid conv per channel
        img = jnp.moveaxis(img, -1, 0)[:, None]  # (C,1,H,W)
        # HIGHEST precision: TPU convs default to bf16 multiply passes, which
        # corrupts the variance terms (filt(x*x) - mu^2 catastrophically
        # cancels) enough to push SSIM above 1 on near-perfect renders.
        out = jax.lax.conv_general_dilated(
            img, jnp.moveaxis(kern, (0, 1, 2, 3), (2, 3, 1, 0)),
            window_strides=(1, 1), padding="VALID",
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(out[:, 0], 0, -1)

    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    mu_x, mu_y = filt(x), filt(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = filt(x * x) - mu_x2
    sigma_y = filt(y * y) - mu_y2
    sigma_xy = filt(x * y) - mu_xy
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)
    )
    return jnp.mean(ssim_map)


def lpips_image(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weights_path: Optional[str] = None,
) -> float:
    """LPIPS perceptual distance; returns NaN when no pretrained feature
    weights are available (see module docstring)."""
    if weights_path is None:
        return float("nan")
    from aonerf.eval.lpips import lpips_from_npz  # lazy: needs weights file

    return float(lpips_from_npz(weights_path, pred, target))


def mse_legacy(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """The reference's masked MSE helper (interface.py:64-70): squared error,
    optionally restricted to ``valid_mask`` pixels, mean-reduced or raw."""
    value = (pred - target) ** 2
    if valid_mask is not None:
        value = value[valid_mask]
    if reduction == "mean":
        return jnp.mean(value)
    return value


def psnr_legacy(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """The reference's per-ray 'legacy' PSNR (interface.py:72-74):
    -10*log10(mse) WITHOUT the [0,1] clipping psnr_each applies, with the
    optional valid-pixel mask. ``reduction='none'`` gives the elementwise
    form the reference's signature exposes."""
    return -10.0 * jnp.log10(mse_legacy(pred, target, valid_mask, reduction))


def psnr_each(preds: Sequence[jnp.ndarray], gts: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-image PSNR over a render set with the reference's [0,1] clip of
    BOTH prediction and target (interface.py:53-62); stacked like its
    torch.stack output."""
    return jnp.stack(
        [
            psnr_image(jnp.clip(p, 0.0, 1.0), jnp.clip(g, 0.0, 1.0))
            for p, g in zip(preds, gts)
        ]
    )


def ssim_legacy(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """The reference's single-pair 'legacy' SSIM (interface.py:86-92 /
    142-155): clip both (H, W, C) images to [0,1], then the same windowed
    SSIM as ssim_image."""
    return ssim_image(jnp.clip(pred, 0.0, 1.0), jnp.clip(target, 0.0, 1.0))


def ssim_each(preds: Sequence[jnp.ndarray], gts: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-image clipped SSIM over a render set (interface.py:102-111)."""
    return jnp.stack([ssim_legacy(p, g) for p, g in zip(preds, gts)])


def depth_mae_rmse(pred: jnp.ndarray, target: jnp.ndarray):
    """(rmse, mae) of a depth render (interface.py:93-99)."""
    abs_diff = jnp.abs(pred - target)
    rmse = jnp.sqrt(jnp.mean(abs_diff**2))
    mae = jnp.mean(abs_diff)
    return rmse, mae


def summarize_metric(
    values: Sequence[float],
    i_train: Optional[Sequence[int]] = None,
    i_val: Optional[Sequence[int]] = None,
    i_test: Optional[Sequence[int]] = None,
) -> Dict[str, float]:
    """Reference-style split summary (interface.py:126-171): with no split
    indices everything lands in 'test'; otherwise per-split means plus the
    overall mean under 'all'."""
    vals = np.asarray([float(v) for v in values])
    out: Dict[str, float] = {}
    if i_train is None and i_val is None and i_test is None:
        out["test"] = float(np.mean(vals)) if len(vals) else float("nan")
        return out
    for name, idx in (("train", i_train), ("val", i_val), ("test", i_test)):
        if idx is not None and len(idx):
            out[name] = float(np.mean(vals[np.asarray(idx)]))
    out["all"] = float(np.mean(vals)) if len(vals) else float("nan")
    return out
