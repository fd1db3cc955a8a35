"""Optimizer / scheduler factory (optax).

Reference parity: utils/__init__.py:32-111 + utils/warmup_scheduler.py:
  - optimizers: sgd (momentum/weight-decay), 'adam' (actually AdamW in the
    reference, :41-42), radam, ranger (RAdam + Lookahead)
  - schedulers (per EPOCH in the reference; here per epoch index passed by
    the caller): steplr (MultiStepLR milestones x gamma), cosine (annealing
    to ~0 over num_epochs), poly ((1 - e/num_epochs)^poly_exp)
  - gradual warmup: lr scales by ((multiplier-1) * e/total + 1) for
    e <= warmup_epochs, then hands off to the wrapped scheduler with base lr
    multiplied (skipped for radam/ranger, as the reference does)
  - separate latent-code optimizer at ``latent_lr`` (AdamW): realized here
    as an optax.multi_transform over the {'model', 'codes'} param split
"""

from typing import Any, Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import optax

_EPS = 1e-8


def make_schedule(
    name: str,
    lr: float,
    num_epochs: int = 80,
    decay_step: Sequence[int] = (20,),
    decay_gamma: float = 0.1,
    poly_exp: float = 0.99,
    steps_per_epoch: int = 1,
) -> Callable:
    """An optax schedule over STEPS; epoch-granular like the reference
    (epoch = step // steps_per_epoch)."""

    def epoch_of(step):
        return jnp.asarray(step, jnp.float32) / steps_per_epoch

    if name == "steplr":
        boundaries = sorted(int(m) * steps_per_epoch for m in decay_step)

        def schedule(step):
            n = sum(jnp.asarray(step >= b, jnp.int32) for b in boundaries)
            return lr * decay_gamma ** jnp.asarray(n, jnp.float32)

        return schedule
    if name == "cosine":

        def schedule(step):
            t = jnp.clip(epoch_of(step) / num_epochs, 0.0, 1.0)
            return _EPS + (lr - _EPS) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

        return schedule
    if name == "poly":

        def schedule(step):
            t = jnp.clip(epoch_of(step) / num_epochs, 0.0, 1.0)
            return lr * (1.0 - t) ** poly_exp

        return schedule
    raise ValueError(f"scheduler {name!r} not recognized")


def with_warmup(
    schedule: Callable,
    lr: float,
    warmup_multiplier: float = 1.0,
    warmup_epochs: int = 0,
    steps_per_epoch: int = 1,
) -> Callable:
    """GradualWarmupScheduler semantics (warmup_scheduler.py:4-57):
    lr * ((m-1) * e/total + 1) during warmup, then the wrapped schedule with
    its base lr scaled by m."""
    if warmup_epochs <= 0:
        return schedule
    if warmup_multiplier < 1.0:
        raise ValueError("multiplier should be greater than or equal to 1.")
    total = warmup_epochs * steps_per_epoch

    def warmed(step):
        e = jnp.asarray(step, jnp.float32) / steps_per_epoch
        ramp = lr * ((warmup_multiplier - 1.0) * jnp.minimum(e, warmup_epochs) / warmup_epochs + 1.0)
        after = schedule(jnp.maximum(step - total, 0)) * warmup_multiplier
        return jnp.where(step <= total, ramp, after)

    return warmed


def make_optimizer(
    optimizer: str = "adam",
    learning_rate: Any = 1e-3,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Reference get_optimizer (utils/__init__.py:32-53). Note 'adam' maps to
    AdamW exactly as the reference does (:41-42)."""
    if optimizer == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.sgd(learning_rate, momentum=momentum),
        )
    if optimizer == "adam":
        return optax.adamw(learning_rate, eps=_EPS, weight_decay=weight_decay)
    if optimizer == "radam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.radam(learning_rate, eps=_EPS),
        )
    if optimizer == "ranger":
        # Ranger = RAdam + Lookahead (torch_optimizer.Ranger)
        inner = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.radam(learning_rate, eps=_EPS),
        )
        return optax.lookahead(inner, sync_period=6, slow_step_size=0.5)
    raise ValueError(f"optimizer {optimizer!r} not recognized")


def make_optimizer_with_latent(
    model_tx: optax.GradientTransformation,
    latent_lr: float = 1e-3,
) -> optax.GradientTransformation:
    """Joint optimizer with a separate AdamW for the latent-code subtree
    (reference get_optimizer_latent, utils/__init__.py:56-62); expects params
    shaped {'model': ..., 'codes': ...} as the auto-decoder trainer uses."""
    latent_tx = optax.adamw(latent_lr, eps=_EPS)
    return optax.multi_transform(
        {"model": model_tx, "codes": latent_tx},
        param_labels={"model": "model", "codes": "codes"},
    )
