"""Jitted train step for the auto-encoder articulated NeRF.

Reference parity: models/vanilla_nerf/model_ae_art.py:356-431
(LitNeRF_AE_ART.training_step):
  loss = maskedMSE(coarse) + maskedMSE(fine)        (fg pixels only, :380-383)
       + MSE(pred_state, deg)                        (joint-state, :385-389)
       + 0.5 * BCEWithLogits(acc, mask) over levels  (opacity, :646-663)
Optimizer/schedule identical to the other systems.
"""

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from aonerf.ops.math import mse2psnr
from aonerf.train.losses import masked_mse, opacity_loss_bce
from aonerf.train.lr import log_lerp_lr
from aonerf.train.step import TrainState


def make_ae_train_step(
    model,
    tx: optax.GradientTransformation,
    white_bkgd: bool,
    near: float,
    far: float,
    randomized: bool = True,
    opacity_lambda: float = 0.5,
    donate: bool = True,
    lr_fn=log_lerp_lr,
) -> Callable:
    def loss_fn(params, batch, render_key):
        levels, latents, pred_state = model.apply(
            params,
            batch,
            batch["src_imgs"][None],  # (1, 3, H, W)
            batch["deg"],
            randomized,
            white_bkgd,
            near,
            far,
            key=render_key,
        )
        mask = batch["instance_mask"]
        loss0 = masked_mse(levels[0][0], batch["target"], mask)
        loss1 = masked_mse(levels[1][0], batch["target"], mask)
        loss_state = jnp.mean((pred_state.reshape(()) - batch["deg"]) ** 2)
        loss_op = opacity_loss_bce(
            [levels[0][1], levels[1][1]], mask, opacity_lambda=opacity_lambda
        )
        loss = loss0 + loss1 + loss_state + loss_op
        return loss, (loss0, loss1, loss_state, loss_op)

    def train_step(state: TrainState, batch, base_key) -> Tuple[TrainState, Dict]:
        render_key = jax.random.fold_in(base_key, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (l0, l1, ls, lo)), grads = grad_fn(state.params, batch, render_key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "loss_state": ls,
            "opacity_loss": lo,
            "psnr0": mse2psnr(l0),
            "psnr1": mse2psnr(l1),
            "lr": lr_fn(state.step),
        }
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
