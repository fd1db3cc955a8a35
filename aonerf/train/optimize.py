"""Test-time latent-code optimization for unseen instances.

The capability the reference's ``is_optimize`` launcher variant points at
(run.py:38-61 builds a keep-every-epoch checkpoint cadence for it;
opt.py:117 the flag) but never implements: given a TRAINED auto-decoder
field, fit a fresh (shape, appearance) code pair for an instance the code
library has never seen, by Adam on the photometric loss over a handful of
posed views — the auto-decoder's signature inversion trick (DeepSDF-style).
The field parameters and the articulation table stay frozen; only the two
object codes move. Afterwards the articulation sweep renders the novel
instance via the trained deformation field.

TPU-first: the whole optimization is ONE jitted lax.scan over fused steps —
buffers for the unseen instance live in HBM and each inner step samples
(articulation, view, pixels) on device exactly like the training path
(sample_multi_batch).
"""

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from aonerf.ops.math import img2mse, mse2psnr
from aonerf.train.step import sample_multi_batch


class CodeState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    codes: Dict[str, jnp.ndarray]  # {'density': (1, D), 'color': (1, D)}
    opt_state: Any


def init_codes(
    key: jax.Array, obj_code_dim: int = 128, scale: float = 0.01
) -> Dict[str, jnp.ndarray]:
    """Small random init for the fresh instance codes (the optimization is
    non-convex; tiny codes start the field near its instance-agnostic
    mean)."""
    k1, k2 = jax.random.split(key)
    return {
        "density": scale * jax.random.normal(k1, (1, obj_code_dim)),
        "color": scale * jax.random.normal(k2, (1, obj_code_dim)),
    }


def make_code_optimize_step(
    model,
    tx: optax.GradientTransformation,
    white_bkgd: bool,
    near: float,
    far: float,
    batch_size: int = 1024,
    randomized: bool = True,
    reg_weight: float = 1e-4,
    inner_steps: int = 1,
) -> Callable:
    """step(state, model_params, art_table, buffers, base_key) ->
    (state, metrics).

    ``model_params`` — trained ArticulatedNeRF params (frozen).
    ``art_table``   — (n_articulations, art_dim) trained articulation code
                      table (frozen); rows indexed by the sampled batch's
                      articulation_id.
    ``buffers``     — device_buffers()-schema dict for the UNSEEN instance
                      only (n_i == 1): its posed views at known articulations.
    Loss matches training (MSE0 + MSE1 + reg·‖codes‖, reference
    model_autodecoder.py:428-466) with gradients flowing ONLY into the
    codes.
    """

    def loss_fn(codes, model_params, art_table, batch, render_key):
        latents = {
            "density": codes["density"],
            "color": codes["color"],
            "articulation": jnp.atleast_2d(art_table[batch["articulation_id"]]),
        }
        out = model.apply(
            model_params, batch, randomized, white_bkgd, near, far, latents,
            key=render_key,
        )
        loss0 = img2mse(out[0][0], batch["target"])
        loss1 = img2mse(out[1][0], batch["target"])
        reg = reg_weight * (
            jnp.linalg.norm(codes["density"]) + jnp.linalg.norm(codes["color"])
        )
        return loss0 + loss1 + reg, (loss0, loss1)

    def one_step(state: CodeState, model_params, art_table, buffers, base_key):
        key = jax.random.fold_in(base_key, state.step)
        sample_key, render_key = jax.random.split(key)
        batch = sample_multi_batch(buffers, sample_key, batch_size)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (loss0, loss1)), grads = grad_fn(
            state.codes, model_params, art_table, batch, render_key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.codes)
        codes = optax.apply_updates(state.codes, updates)
        metrics = {
            "loss": loss,
            "psnr0": mse2psnr(loss0),
            "psnr1": mse2psnr(loss1),
        }
        return CodeState(step=state.step + 1, codes=codes, opt_state=opt_state), metrics

    if inner_steps <= 1:
        return jax.jit(one_step, donate_argnums=(0,))

    def multi_step(state, model_params, art_table, buffers, base_key):
        def body(carry, _):
            return one_step(carry, model_params, art_table, buffers, base_key)

        state, metrics = jax.lax.scan(body, state, None, length=inner_steps)
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    return jax.jit(multi_step, donate_argnums=(0,))


def optimize_codes(
    model,
    model_params,
    art_table: jnp.ndarray,
    buffers: Dict[str, jnp.ndarray],
    key: jax.Array,
    n_steps: int = 500,
    lr: float = 1e-2,
    batch_size: int = 1024,
    obj_code_dim: int = 128,
    white_bkgd: bool = True,
    near: float = 2.0,
    far: float = 6.0,
    reg_weight: float = 1e-4,
    inner_steps: int = 50,
    init: Optional[Dict[str, jnp.ndarray]] = None,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, list]]:
    """Fit fresh codes for an unseen instance; returns (codes, history).

    history['psnr1'] tracks fine-level PSNR per fused dispatch — the e2e
    signal that inversion works (it must climb). ``obj_code_dim`` must match
    the trained library's (reference default 128, code_library.py:22-28).
    """
    init_key, opt_key = jax.random.split(key)
    codes = init if init is not None else init_codes(init_key, obj_code_dim)
    tx = optax.adam(lr)
    state = CodeState(
        step=jnp.zeros((), jnp.int32), codes=codes, opt_state=tx.init(codes)
    )
    step = make_code_optimize_step(
        model, tx, white_bkgd, near, far, batch_size=batch_size,
        reg_weight=reg_weight, inner_steps=inner_steps,
    )
    history = {"loss": [], "psnr1": []}
    done = 0
    while done < n_steps:
        state, metrics = step(state, model_params, art_table, buffers, opt_key)
        done += inner_steps
        history["loss"].append(float(metrics["loss"]))
        history["psnr1"].append(float(metrics["psnr1"]))
    return jax.device_get(state.codes), history
