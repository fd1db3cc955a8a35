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

from typing import Any, Callable, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

_EPS = 1e-8


class FlatLookaheadState(NamedTuple):
    inner: Any
    slow: Any
    count: jnp.ndarray


def flat_lookahead(
    inner: optax.GradientTransformation,
    sync_period: int = 6,
    slow_step_size: float = 0.5,
) -> optax.GradientTransformation:
    """Lookahead that keeps the slow weights in the OPTIMIZER STATE instead
    of wrapping the params in fast/slow copies (optax.lookahead requires
    ``LookaheadParams``, which breaks a generic TrainState). Semantics match
    torch_optimizer.Ranger's wrapper: fast weights take ``inner`` steps;
    every ``sync_period`` steps slow += alpha*(fast-slow) and fast resets to
    slow."""

    def init(params):
        # materialize a COPY of the params: aliasing them would make the
        # train state donate the same buffer twice (params + slow) under
        # jit(donate_argnums)
        slow = jax.tree_util.tree_map(jnp.array, params)
        return FlatLookaheadState(
            inner=inner.init(params), slow=slow, count=jnp.zeros((), jnp.int32)
        )

    def update(updates, state, params):
        if params is None:
            raise ValueError("flat_lookahead requires params")
        u, inner_state = inner.update(updates, state.inner, params)
        fast = optax.apply_updates(params, u)
        count = state.count + 1
        sync = (count % sync_period) == 0
        slow_new = jax.tree_util.tree_map(
            lambda s, f: s + slow_step_size * (f - s), state.slow, fast
        )
        new_params = jax.tree_util.tree_map(
            lambda sn, f: jnp.where(sync, sn, f), slow_new, fast
        )
        new_slow = jax.tree_util.tree_map(
            lambda sn, s: jnp.where(sync, sn, s), slow_new, state.slow
        )
        final_updates = jax.tree_util.tree_map(
            lambda n, p: n - p, new_params, params
        )
        return final_updates, FlatLookaheadState(
            inner=inner_state, slow=new_slow, count=count
        )

    return optax.GradientTransformation(init, update)


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
        # Ranger = RAdam + Lookahead (torch_optimizer.Ranger); flat_lookahead
        # keeps slow weights in the opt state so plain param pytrees work
        inner = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.radam(learning_rate, eps=_EPS),
        )
        return flat_lookahead(inner, sync_period=6, slow_step_size=0.5)
    raise ValueError(f"optimizer {optimizer!r} not recognized")


def build_optimizer_from_config(cfg) -> tuple:
    """(tx, lr_fn) for a Config (duck-typed: any object with the optimizer
    fields). Routes the reference's optimizer/scheduler flags
    (opt.py:134-162) to the factories above:

      optimizer == "adam" and lr_scheduler is None (default)
        -> Adam with the reference systems' manual log-lerp + sin-delay
           schedule (model.py:391-414) — what every reference system runs
      anything else
        -> make_optimizer(optimizer) with make_schedule(lr_scheduler or
           "poly") and the gradual-warmup wrapper (skipped for radam/ranger,
           as the reference does, run get_optimizer/get_scheduler)

    ``grad_clip`` > 0 prepends clip_by_global_norm either way. ``latent_lr``
    (autodecoder param trees shaped {'model','codes'}) splits off an AdamW
    for the code tables at that lr."""
    from functools import partial

    from aonerf.train.lr import log_lerp_lr

    if cfg.optimizer == "adam" and cfg.lr_scheduler is None:
        from aonerf.train.step import make_adam

        lr_fn = partial(
            log_lerp_lr,
            lr_init=cfg.lr_init,
            lr_final=cfg.lr_final,
            max_steps=cfg.run_max_steps,
            lr_delay_steps=cfg.lr_delay_steps,
            lr_delay_mult=cfg.lr_delay_mult,
        )
        tx = make_adam(
            lr_init=cfg.lr_init,
            lr_final=cfg.lr_final,
            max_steps=cfg.run_max_steps,
            lr_delay_steps=cfg.lr_delay_steps,
            lr_delay_mult=cfg.lr_delay_mult,
            grad_clip=cfg.grad_clip or None,
        )
    else:
        schedule = make_schedule(
            cfg.lr_scheduler or "poly",
            lr=cfg.lr_init,
            num_epochs=cfg.num_epochs,
            decay_step=cfg.decay_step,
            decay_gamma=cfg.decay_gamma,
            poly_exp=cfg.poly_exp,
            steps_per_epoch=cfg.steps_per_epoch,
        )
        if cfg.optimizer not in ("radam", "ranger"):  # reference skip rule
            schedule = with_warmup(
                schedule,
                lr=cfg.lr_init,
                warmup_multiplier=cfg.warmup_multiplier,
                warmup_epochs=cfg.warmup_epochs,
                steps_per_epoch=cfg.steps_per_epoch,
            )
        lr_fn = schedule
        tx = make_optimizer(
            cfg.optimizer,
            learning_rate=schedule,
            momentum=cfg.momentum,
            weight_decay=cfg.weight_decay,
        )
        if cfg.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)

    if cfg.latent_lr is not None and getattr(cfg, "exp_type", "") == "vanilla_autodecoder":
        # only the autodecoder has the {'model','codes'} split this rides on
        tx = make_optimizer_with_latent(tx, latent_lr=cfg.latent_lr)
    return tx, lr_fn


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
