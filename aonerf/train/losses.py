"""Loss terms beyond plain MSE.

Reference parity:
  - code regularization: model_autodecoder.py:456-466
    (1e-4 * sum of mean-over-channels of the latent's dim-0 norm; for the
    (1, C) latents of the reference this is the mean absolute value)
  - opacity losses: model_autodecoder.py:703-766 (MSE / BCE-with-logits /
    autorf fg-bg variants); the BCE variant is the one active in the
    auto-encoder system (model_ae_art.py:646-663)
  - masked photometric loss: model_ae_art.py:380-383
"""

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp


def code_regularization(latents: Dict[str, jnp.ndarray], weight: float = 1e-4) -> jnp.ndarray:
    reg = 0.0
    for name in ("density", "color", "articulation"):
        code = jnp.atleast_2d(latents[name])
        reg = reg + jnp.mean(jnp.linalg.norm(code, axis=0))
    return weight * reg


def opacity_loss_mse(
    accs: Sequence[jnp.ndarray], instance_mask: jnp.ndarray
) -> jnp.ndarray:
    """Clamped-MSE opacity loss over both levels (model_autodecoder.py:703-717)."""
    mask = instance_mask.astype(jnp.float32)
    loss = 0.0
    for acc in accs:
        loss = loss + jnp.mean((jnp.clip(acc, 0.0, 1.0) - mask) ** 2)
    return loss


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    # log(1 + exp(-|x|)) formulation for stability, as torch BCEWithLogitsLoss
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def opacity_loss_bce(
    accs: Sequence[jnp.ndarray],
    instance_mask: jnp.ndarray,
    opacity_lambda: float = 0.05,
) -> jnp.ndarray:
    """BCE-with-logits opacity loss (model_autodecoder.py:719-736); the
    accumulated opacity plays the role of the logit, as in the reference."""
    mask = instance_mask.astype(jnp.float32)
    loss = 0.0
    for acc in accs:
        loss = loss + _bce_with_logits(acc.astype(jnp.float32), mask)
    return loss * opacity_lambda


def opacity_loss_bce_prob(
    accs: Sequence[jnp.ndarray],
    instance_mask: jnp.ndarray,
    opacity_lambda: float = 0.5,
    eps: float = 1e-2,
) -> jnp.ndarray:
    """True-probability BCE(acc, mask) over levels — the WORKING opacity loss.

    The reference's active variant (opacity_loss_CE, model_ae_art.py:646-663)
    feeds the accumulated opacity — already a probability in [0, 1] — through
    BCEWithLogits, so sigmoid(acc) >= 0.5 and background pixels exert a
    constant, unsatisfiable downward force on density (grad 0.5·λ per bg
    pixel at acc=0, forever). Measured here, that pressure collapses the AE
    field mid-training (acc -> 0 globally, RESULTS.md).

    Treating acc as the probability it is makes acc==mask the optimum. The
    clip on p means the gradient is exactly zero at full saturation (acc=0 or
    1) — deliberate: it bounds the opacity force to λ·1/eps only INSIDE the
    support and leaves saturated states to the photometric loss instead of
    shoving them. Measured across the probe matrix (RESULTS.md): this is the
    only variant that kept both hierarchy levels alive over a long horizon —
    an eps-inside-the-log form (unbounded restoring force at the boundaries)
    froze one level into saturation, as did the clamped-MSE and logits forms.
    """
    mask = instance_mask.astype(jnp.float32)
    loss = 0.0
    for acc in accs:
        p = jnp.clip(acc.astype(jnp.float32), eps, 1.0 - eps)
        loss = loss + jnp.mean(-(mask * jnp.log(p) + (1.0 - mask) * jnp.log1p(-p)))
    return loss * opacity_lambda


def opacity_loss_autorf(
    accs: Sequence[jnp.ndarray], instance_mask: jnp.ndarray
) -> jnp.ndarray:
    """AutoRF-style fg/bg opacity loss (model_autodecoder.py:738-766).

    Masked means are computed with where-averages (static shapes). Note the
    reference uses the COARSE opacity in both fg terms (:758-762); we keep
    that behavior for parity.
    """
    mask = instance_mask.astype(bool)
    coarse, fine = accs[0], accs[1]
    n = mask.size
    bg = ~mask
    bg_count = jnp.sum(bg)
    fg_count = jnp.sum(mask)
    bg_ratio = bg_count / n
    fg_ratio = fg_count / n

    def mean_where(x, m, count):
        return jnp.where(count > 0, jnp.sum(jnp.where(m, x, 0.0)) / jnp.maximum(count, 1), 0.0)

    loss = mean_where(coarse, bg, bg_count) * bg_ratio
    loss = loss + mean_where(fine, bg, bg_count) * bg_ratio
    loss = loss + fg_ratio * mean_where(1.0 - coarse, mask, fg_count)
    loss = loss + fg_ratio * mean_where(1.0 - coarse, mask, fg_count)
    return loss


def masked_mse(
    pred: jnp.ndarray, target: jnp.ndarray, instance_mask: jnp.ndarray
) -> jnp.ndarray:
    """Foreground-only photometric MSE (model_ae_art.py:380-383), computed
    with a static-shape where-average."""
    mask = instance_mask.astype(jnp.float32)[..., None]
    num = jnp.sum(mask * (pred - target) ** 2)
    den = jnp.maximum(jnp.sum(mask) * pred.shape[-1], 1.0)
    return num / den
