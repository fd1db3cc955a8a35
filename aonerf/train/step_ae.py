"""Jitted train step for the auto-encoder articulated NeRF.

Reference parity: models/vanilla_nerf/model_ae_art.py:356-431
(LitNeRF_AE_ART.training_step):
  loss = maskedMSE(coarse) + maskedMSE(fine)        (fg pixels only, :380-383)
       + MSE(pred_state, deg)                        (joint-state, :385-389)
       + 0.5 * opacity(acc, mask) over levels        (opacity, :630-691)
Optimizer/schedule identical to the other systems. The opacity default here
is a clipped true-probability BCE, not the reference's active BCEWithLogits
one — the logits form provably collapses the field (see _OPACITY_LOSSES).
"""

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from aonerf.ops.math import mse2psnr
from aonerf.train.losses import (
    masked_mse,
    opacity_loss_bce,
    opacity_loss_bce_prob,
    opacity_loss_mse,
)
from aonerf.train.lr import log_lerp_lr
from aonerf.train.step import (
    TrainState,
    _data_axis,
    _ddp_shard_map,
    _pvary,
    sample_multi_batch,
    sample_multi_batch_multiview,
)

# Opacity-loss variants. The WORKING default is "bce_prob" — clipped
# true-probability BCE (losses.opacity_loss_bce_prob): satisfiable optimum
# (acc==mask) and bounded forces that leave saturated states alone. In the
# measured probe matrix (RESULTS.md) it is the only variant that kept both
# hierarchy levels alive over a long horizon. The reference's ACTIVE choice
# "bce_logits" (opacity_loss_CE, model_ae_art.py:646-663) feeds a probability
# through BCEWithLogits, whose bg gradient never vanishes — it collapses the
# field mid-training; its clamped-MSE variant "mse" (:630-644) froze the fine
# level the same way. All reference variants stay available for parity.
_OPACITY_LOSSES = {
    "mse": lambda accs, mask, opacity_lambda: opacity_loss_mse(accs, mask)
    * opacity_lambda,
    "bce_prob": opacity_loss_bce_prob,
    "bce_logits": opacity_loss_bce,
    "none": lambda accs, mask, opacity_lambda: jnp.zeros(()),
    # Composite: prob-BCE's strong boundary pulls plus the clamped MSE's
    # uniform linear pull toward acc==mask.
    "bce_prob+mse": lambda accs, mask, opacity_lambda: (
        opacity_loss_bce_prob(accs, mask, opacity_lambda=opacity_lambda)
        + opacity_loss_mse(accs, mask) * opacity_lambda
    ),
}


def _ae_loss_fn(
    model, white_bkgd, near, far, randomized, opacity_lambda,
    opacity_loss: str = "bce_prob", photometric: str = "masked",
    return_latents: bool = False,
) -> Callable:
    opacity_fn = _OPACITY_LOSSES[opacity_loss]

    def loss_fn(params, batch, render_key):
        src = batch["src_imgs"]
        if src.ndim == 3:  # single view (3, H, W) -> batch of one
            src = src[None]
        levels, latents, pred_state = model.apply(
            params,
            batch,
            src,  # (V, 3, H, W); V > 1 = multi-view batched encode
            batch["deg"],
            randomized,
            white_bkgd,
            near,
            far,
            key=render_key,
        )
        mask = batch["instance_mask"].astype(jnp.float32)
        if photometric == "masked":  # reference: fg pixels only (:380-383)
            loss0 = masked_mse(levels[0][0], batch["target"], mask)
            loss1 = masked_mse(levels[1][0], batch["target"], mask)
        else:  # "full": all pixels (targets are already white-composited)
            loss0 = jnp.mean((levels[0][0] - batch["target"]) ** 2)
            loss1 = jnp.mean((levels[1][0] - batch["target"]) ** 2)
        loss_state = jnp.mean(
            (pred_state.reshape(-1) - jnp.atleast_1d(batch["deg"])) ** 2
        )
        loss_op = opacity_fn(
            [levels[0][1], levels[1][1]], mask, opacity_lambda=opacity_lambda
        )
        loss = loss0 + loss1 + loss_state + loss_op
        if return_latents:  # detached cache for encode-reuse field steps
            cached = jax.tree_util.tree_map(jax.lax.stop_gradient, latents)
            return loss, (loss0, loss1, loss_state, loss_op, cached)
        return loss, (loss0, loss1, loss_state, loss_op)

    return loss_fn


def _ae_field_loss_fn(
    model, white_bkgd, near, far, randomized, opacity_lambda,
    opacity_loss: str = "bce_prob", photometric: str = "masked",
) -> Callable:
    """Field-only AE loss on CACHED (detached) latents: photometric + opacity
    over the rendering field, no encoder forward/backward and no state loss
    (pred_state is a constant of the cached latents). The cheap body of the
    encode-reuse step."""
    opacity_fn = _OPACITY_LOSSES[opacity_loss]

    def loss_fn(params, batch, latents, render_key):
        levels = model.apply(
            params, batch, randomized, white_bkgd, near, far, latents,
            key=render_key, method=model.render,
        )
        mask = batch["instance_mask"].astype(jnp.float32)
        if photometric == "masked":
            loss0 = masked_mse(levels[0][0], batch["target"], mask)
            loss1 = masked_mse(levels[1][0], batch["target"], mask)
        else:
            loss0 = jnp.mean((levels[0][0] - batch["target"]) ** 2)
            loss1 = jnp.mean((levels[1][0] - batch["target"]) ** 2)
        loss_op = opacity_fn(
            [levels[0][1], levels[1][1]], mask, opacity_lambda=opacity_lambda
        )
        loss = loss0 + loss1 + loss_op
        return loss, (loss0, loss1, loss_op)

    return loss_fn


def field_update_mask(params):
    """Params-structured tree of STATIC bools: True for leaves under the
    'field' submodule (updated every step of an encode-reuse group), False
    for the encoder / joint-state decoder / deg-embedding partition (frozen
    on field-only steps)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(getattr(k, "key", None) == "field" for k in path),
        params,
    )


def masked_field_update(tx, grads, opt_state, params):
    """``tx.update`` restricted to the field partition: non-field updates are
    zeroed AND their optimizer-state slices (e.g. Adam moments) carried
    through from ``opt_state`` unchanged, so frozen params neither move (a
    stateful optimizer like Adam would otherwise keep updating them from the
    decaying first moment even on zero gradients) nor accumulate stale
    momentum during field-only steps. Non-param optimizer-state leaves (the
    shared bias-correction/schedule counts) take the updated values."""
    mask = field_update_mask(params)
    updates, new_os = tx.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(
        lambda u, m: u if m else jnp.zeros_like(u), updates, mask
    )
    # opt-state-structured mask: param slots -> static bool; every other
    # leaf (counts etc.) keeps new_os's array value -> "take new" below
    mask_os = optax.tree_map_params(tx, lambda _, m: m, new_os, mask)
    new_os = jax.tree_util.tree_map(
        lambda new, old, m: new if not isinstance(m, bool) or m else old,
        new_os, opt_state, mask_os,
    )
    return updates, new_os


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
    opacity_loss: str = "bce_prob",
    photometric: str = "masked",
) -> Callable:
    loss_fn = _ae_loss_fn(
        model, white_bkgd, near, far, randomized, opacity_lambda,
        opacity_loss=opacity_loss, photometric=photometric,
    )

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


def make_ae_device_train_step(
    model,
    tx: optax.GradientTransformation,
    white_bkgd: bool,
    near: float,
    far: float,
    img_wh: Tuple[int, int],
    batch_size: int = 4096,
    randomized: bool = True,
    opacity_lambda: float = 0.5,
    donate: bool = True,
    lr_fn=log_lerp_lr,
    inner_steps: int = 1,
    opacity_loss: str = "bce_prob",
    photometric: str = "masked",
    mesh: Optional[Mesh] = None,
    views_per_step: int = 1,
    sharded_views: bool = False,
    encode_reuse: int = 1,
) -> Callable:
    """Fully on-device auto-encoder step: (instance, articulation, view,
    pixel) sampling AND the source-image gather + [-1,1] normalization happen
    inside the jitted program (sample_multi_batch with src_hw), so a step —
    including the ResNet encode of the sampled view — needs zero host work or
    transfer. ``inner_steps`` > 1 scan-fuses that many optimizer steps per
    dispatch, exactly like the vanilla/autodecoder multi-steps.

    ``views_per_step`` > 1 samples that many independent (instance,
    articulation, view) draws per step and batches their ResNet encodes into
    one (V, 3, H, W) forward, each view conditioning its own batch_size/V
    slice of the rays (sample_multi_batch_multiview) — amortizing the
    encoder (the AE throughput bottleneck, RESULTS.md) over V views.

    Replaces the reference's host DataLoader + Lightning step pair
    (model_ae_art.py:356-431 over sapien_multi.py:250-306) for rectangular
    datasets; the host-batched make_ae_train_step remains the fallback.
    step(state, buffers, base_key) -> (state, metrics); ``buffers`` from
    SapienMultiDataset.device_buffers(), uploaded once (replicated).

    ``mesh`` with >1 chip on 'data' enables DDP exactly as in
    make_autodecoder_device_train_step: per-chip distinct (instance,
    articulation, view, pixels) — so each chip ALSO encodes its own source
    view — and pmean'd grads; global batch = n_chips * batch_size (and
    n_chips source views per step).

    ``sharded_views`` (requires the DDP mesh): buffers arrive view-sharded
    over 'data' (parallel.shard_multi_buffers); each chip samples — and
    encodes — only views from its local slice, cutting per-chip HBM by the
    mesh size. See make_autodecoder_device_train_step.

    ``encode_reuse`` R > 1: each group of R optimizer steps trains on ONE
    sampled view — step 1 is a full step (encode fwd+bwd + field), steps
    2..R are FIELD-ONLY steps on the step-1 latents (detached): fresh random
    pixels each step, photometric + opacity losses, no encoder compute at
    all. At the quality preset (batch 160) the ResNet encode is ~60% of the
    step, so this is the temporal analogue of views_per_step's spatial
    batching — it amortizes the encoder without leaving the small-batch
    VMEM sweet spot the round-3 matrix showed is where quality comes from.
    The encoder/state-decoder/deg-embedding update every R-th step; the
    field updates every step. Field-only steps enforce this by MASKING the
    optimizer: non-field updates are zeroed and the non-field slices of the
    optimizer state are carried through unchanged, so a stateful optimizer
    (Adam's decaying first moment would otherwise keep moving encoder params
    on zero gradients) leaves the frozen partition bitwise untouched. Two
    deliberate consequences: the Adam bias-correction counter is shared
    (frozen moments resume with the global count), and grad clipping on a
    field-only step sees the field-grad norm only — the natural norm for
    the params that step updates. Measured throughput + equal-ray quality:
    RESULTS.md (round 4).
    """
    if views_per_step > 1 and batch_size % views_per_step != 0:
        raise ValueError(
            f"batch_size ({batch_size}) must be divisible by views_per_step "
            f"({views_per_step}); otherwise {batch_size % views_per_step} "
            "rays/step would silently be dropped"
        )
    if encode_reuse > 1 and views_per_step > 1:
        raise ValueError(
            "encode_reuse and views_per_step are alternative encoder-"
            "amortization levers; combine is not supported"
        )
    loss_fn = _ae_loss_fn(
        model, white_bkgd, near, far, randomized, opacity_lambda,
        opacity_loss=opacity_loss, photometric=photometric,
    )
    w, h = img_wh
    axis = _data_axis(mesh)
    if sharded_views and axis is None:
        raise ValueError("sharded_views requires a mesh with >1 'data' chip")

    def one_step(state: TrainState, buffers, base_key):
        key = jax.random.fold_in(base_key, state.step)
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        sample_key, render_key = jax.random.split(key)
        if views_per_step > 1:
            batch = sample_multi_batch_multiview(
                buffers, sample_key, batch_size, views_per_step, src_hw=(h, w)
            )
        else:
            batch = sample_multi_batch(buffers, sample_key, batch_size, src_hw=(h, w))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        diff_params = state.params if axis is None else _pvary(state.params, axis)
        (loss, (l0, l1, ls, lo)), grads = grad_fn(diff_params, batch, render_key)
        if axis is not None:  # DDP gradient all-reduce (the reference's NCCL)
            grads = jax.lax.pmean(grads, axis)
            loss, l0, l1, ls, lo = jax.lax.pmean((loss, l0, l1, ls, lo), axis)
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

    if encode_reuse > 1:
        if inner_steps % encode_reuse != 0:
            raise ValueError(
                f"inner_steps ({inner_steps}) must be a multiple of "
                f"encode_reuse ({encode_reuse}) so a dispatch holds whole "
                "groups"
            )
        from aonerf.train.step import sample_view, sample_view_pixels, view_src_image

        full_loss = _ae_loss_fn(
            model, white_bkgd, near, far, randomized, opacity_lambda,
            opacity_loss=opacity_loss, photometric=photometric,
            return_latents=True,
        )
        field_loss = _ae_field_loss_fn(
            model, white_bkgd, near, far, randomized, opacity_lambda,
            opacity_loss=opacity_loss, photometric=photometric,
        )

        def _step_key(state, base_key):
            key = jax.random.fold_in(base_key, state.step)
            if axis is not None:
                key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            return jax.random.split(key)

        def group_step(state: TrainState, buffers, base_key):
            # step 1 of the group: sample a view, full encode+field step
            sample_key, render_key = _step_key(state, base_key)
            k_view, k_pix = jax.random.split(sample_key)
            view = sample_view(buffers, k_view)
            batch = sample_view_pixels(view, buffers["directions"], k_pix, batch_size)
            batch["src_imgs"] = view_src_image(view, (h, w))
            diff_params = state.params if axis is None else _pvary(state.params, axis)
            (loss, (l0, l1, ls, lo, latents)), grads = jax.value_and_grad(
                full_loss, has_aux=True
            )(diff_params, batch, render_key)
            if axis is not None:
                grads = jax.lax.pmean(grads, axis)
                loss, l0, l1, ls, lo = jax.lax.pmean((loss, l0, l1, ls, lo), axis)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)

            # steps 2..R: field-only on the cached (detached) latents
            def field_body(carry, _):
                st = carry
                s_key, r_key = _step_key(st, base_key)
                b = sample_view_pixels(view, buffers["directions"], s_key, batch_size)
                dp = st.params if axis is None else _pvary(st.params, axis)
                (fl, (f0, f1, fo)), g = jax.value_and_grad(
                    field_loss, has_aux=True
                )(dp, b, latents, r_key)
                if axis is not None:
                    g = jax.lax.pmean(g, axis)
                    fl, f0, f1, fo = jax.lax.pmean((fl, f0, f1, fo), axis)
                up, os_ = masked_field_update(tx, g, st.opt_state, st.params)
                p = optax.apply_updates(st.params, up)
                return (
                    TrainState(step=st.step + 1, params=p, opt_state=os_),
                    (fl, f0, f1, fo),
                )

            state, (fl, f0, f1, fo) = jax.lax.scan(
                field_body, state, None, length=encode_reuse - 1
            )
            metrics = {
                "loss": fl[-1] + ls,  # comparable total (state loss is the
                # group's full-step value; field steps don't recompute it)
                "loss_state": ls,
                "opacity_loss": fo[-1],
                "psnr0": mse2psnr(f0[-1]),
                "psnr1": mse2psnr(f1[-1]),
                "lr": lr_fn(state.step),
            }
            return state, metrics

        def fn(state, buffers, base_key):
            def body(carry, _):
                return group_step(carry, buffers, base_key)

            state, metrics = jax.lax.scan(
                body, state, None, length=inner_steps // encode_reuse
            )
            return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    elif inner_steps <= 1:
        fn = one_step
    else:

        def fn(state, buffers, base_key):
            def body(carry, _):
                return one_step(carry, buffers, base_key)

            state, metrics = jax.lax.scan(body, state, None, length=inner_steps)
            return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    if axis is not None:
        from aonerf.parallel import multi_buffer_specs

        fn = _ddp_shard_map(fn, mesh, multi_buffer_specs(sharded_views))
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
