"""Jitted train steps with on-device ray-batch sampling.

TPU-first redesign of the reference's training_step + optimizer_step
(models/vanilla_nerf/model.py:256-419, model_autodecoder.py:395-477,608-636):
one compiled XLA program per step does (batch gather -> hierarchical render ->
MSE losses -> grads -> Adam with the log-lerp LR schedule). The gradient
all-reduce over the data mesh axis is emitted by XLA from the shardings
(params replicated, rays sharded) — the reference's DDP/NCCL equivalent.
"""

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from aonerf.ops.math import img2mse, mse2psnr
from aonerf.train.losses import code_regularization
from aonerf.train.lr import log_lerp_lr


def _data_axis(mesh: Optional[Mesh]) -> Optional[str]:
    """'data' when the mesh has >1 chip on its data axis, else None.

    The articulated device steps use this to pick between the single-chip
    body and the DDP body (shard_map + per-chip sampling + pmean'd grads) —
    the reference's multi-GPU articulated story (run.py:109-111, 7-GPU DDP
    per README.md:105)."""
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        return "data"
    return None


def _ddp_shard_map(
    fn: Callable, mesh: Mesh, buffer_specs: Optional[Any] = None
) -> Callable:
    """shard_map a (state, buffers, base_key) -> (state, metrics) step body
    over the whole mesh. Default: everything replicated — the per-chip
    variation comes only from fold_in(key, axis_index('data')) inside the
    body, and pmean makes every output replicated again. ``buffer_specs``
    (see parallel.multi_buffer_specs) shards the scene buffers instead:
    each chip's body then sees only its LOCAL view slice (the sampler reads
    local shapes, so per-chip sampling stays in-slice with no code change)."""
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), buffer_specs if buffer_specs is not None else P(), P()),
        out_specs=(P(), P()),
    )


def _pvary(tree: Any, axis: str) -> Any:
    """Mark a replicated pytree as device-varying on ``axis``.

    Needed before value_and_grad inside shard_map: with JAX's VMA tracking,
    differentiating UNVARYING params against a varying loss auto-inserts a
    psum over the axis (transpose of the implicit pvary broadcast), and a
    later pmean on that already-replicated result is identity — i.e. the
    grads silently become the SUM, not the mean. Casting params to varying
    first keeps the local grads local so an explicit pmean really averages
    (verified by the DDP-vs-oracle tests in tests/test_parallel.py)."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.pcast(a, axis, to="varying"), tree
    )


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_adam(
    lr_init: float = 5.0e-4,
    lr_final: float = 5.0e-6,
    max_steps: int = 100_000,
    lr_delay_steps: int = 2500,
    lr_delay_mult: float = 0.01,
    grad_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam(0.9, 0.999) with the reference's log-lerp + sin-delay schedule.

    ``grad_clip`` (global-norm) is off by default (the reference has no
    clipping); bf16 compute needs it — measured: the fine level learns then
    diverges mid-run without it (loss spike it never recovers from), and
    clip=1.0 keeps the trajectory on par with f32.
    """
    schedule = partial(
        log_lerp_lr,
        lr_init=lr_init,
        lr_final=lr_final,
        max_steps=max_steps,
        lr_delay_steps=lr_delay_steps,
        lr_delay_mult=lr_delay_mult,
    )
    adam = optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8)
    if grad_clip:
        return optax.chain(optax.clip_by_global_norm(grad_clip), adam)
    return adam


def create_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def sample_ray_batch(
    buffers: Dict[str, jnp.ndarray], key: jax.Array, batch_size: int
) -> Dict[str, jnp.ndarray]:
    """Uniform with-replacement gather of ``batch_size`` rays from the
    device-resident scene buffers — replaces the reference's host DataLoader
    of precomputed rays (datasets/sapien.py:83-131) with a single on-device
    gather that pipelines with compute."""
    n = buffers["rays_o"].shape[0]
    idx = jax.random.randint(key, (batch_size,), 0, n)
    return {k: v[idx] for k, v in buffers.items()}


def make_vanilla_train_step(
    model,
    tx: optax.GradientTransformation,
    white_bkgd: bool,
    near: float,
    far: float,
    batch_size: int = 2048,
    randomized: bool = True,
    donate: bool = True,
    lr_fn: Callable = log_lerp_lr,
) -> Callable:
    """Train step for the vanilla NeRF (reference LitNeRF.training_step,
    model.py:256-282: loss = MSE(coarse) + MSE(fine)).

    Returns step(state, buffers, base_key) -> (state, metrics); the per-step
    PRNG is derived from fold_in(base_key, step) so runs are host-invariant
    and resumable.
    """

    def loss_fn(params, batch, render_key):
        out = model.apply(
            params, batch, randomized, white_bkgd, near, far, key=render_key
        )
        loss0 = img2mse(out[0][0], batch["target"])
        loss1 = img2mse(out[1][0], batch["target"])
        loss = loss1 + loss0
        return loss, (loss0, loss1)

    def train_step(state: TrainState, buffers, base_key) -> Tuple[TrainState, Dict]:
        key = jax.random.fold_in(base_key, state.step)
        sample_key, render_key = jax.random.split(key)
        batch = sample_ray_batch(buffers, sample_key, batch_size)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (loss0, loss1)), grads = grad_fn(state.params, batch, render_key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "psnr0": mse2psnr(loss0),
            "psnr1": mse2psnr(loss1),
            "lr": lr_fn(state.step),
        }
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_vanilla_train_multi_step(
    model,
    tx: optax.GradientTransformation,
    white_bkgd: bool,
    near: float,
    far: float,
    batch_size: int = 2048,
    inner_steps: int = 10,
    randomized: bool = True,
    donate: bool = True,
    lr_fn: Callable = log_lerp_lr,
) -> Callable:
    """``inner_steps`` optimizer steps fused into ONE compiled program via
    lax.scan. One dispatch + one host fetch per K steps amortizes dispatch/
    tunnel latency K-fold; per-step PRNG still derives from
    fold_in(base_key, step), so results are identical to K single steps.
    Returns step(state, buffers, base_key) -> (state, metrics_of_last_step).
    """

    def loss_fn(params, batch, render_key):
        out = model.apply(
            params, batch, randomized, white_bkgd, near, far, key=render_key
        )
        loss0 = img2mse(out[0][0], batch["target"])
        loss1 = img2mse(out[1][0], batch["target"])
        return loss1 + loss0, (loss0, loss1)

    def one_step(carry, _):
        state, buffers, base_key = carry
        key = jax.random.fold_in(base_key, state.step)
        sample_key, render_key = jax.random.split(key)
        batch = sample_ray_batch(buffers, sample_key, batch_size)
        (loss, (loss0, loss1)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, render_key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = {
            "loss": loss,
            "psnr0": mse2psnr(loss0),
            "psnr1": mse2psnr(loss1),
            "lr": lr_fn(state.step),
        }
        return (new_state, buffers, base_key), metrics

    def multi_step(state, buffers, base_key):
        (state, _, _), metrics = jax.lax.scan(
            one_step, (state, buffers, base_key), None, length=inner_steps
        )
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    return jax.jit(multi_step, donate_argnums=(0,) if donate else ())


def sample_multi_batch(
    buffers: Dict[str, jnp.ndarray],
    key: jax.Array,
    batch_size: int,
    src_hw: Optional[Tuple[int, int]] = None,
) -> Dict[str, jnp.ndarray]:
    """On-device sampling of a multi-config batch: pick a random (instance,
    articulation, view), gather ``batch_size`` random pixels, and build the
    world-space rays from the stored c2w — all inside the jitted step.

    Replaces the reference's host DataLoader item (datasets/sapien_multi.py:
    362-399: disk IO + PIL decode + host ray math per step) with pure HBM
    gathers. ``buffers`` comes from SapienMultiDataset.device_buffers().
    Direction semantics match get_rays (ray_utils.py:118-159): rays_d and
    viewdirs are both the unit-normalized rotated directions.

    ``src_hw`` = (h, w): also emit the sampled view itself as ``src_imgs``,
    a (3, h, w) image normalized to [-1, 1] (the reference's img_transform,
    sapien_multi.py:144) for the auto-encoder's image encoder.
    """
    n_i, n_d, n_v, hw, _ = buffers["rgb"].shape
    k_i, k_d, k_v, k_pix = jax.random.split(key, 4)
    ii = jax.random.randint(k_i, (), 0, n_i)
    di = jax.random.randint(k_d, (), 0, n_d)
    vi = jax.random.randint(k_v, (), 0, n_v)
    pix = jax.random.randint(k_pix, (batch_size,), 0, hw)

    c2w = buffers["c2w"][ii, di, vi]  # (3, 4)
    dirs = buffers["directions"][pix]  # (B, 3) camera frame
    world_d = dirs @ c2w[:, :3].T
    viewdirs = world_d / jnp.linalg.norm(world_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:, 3], viewdirs.shape)

    view_rgb = buffers["rgb"][ii, di, vi]  # (hw, 3) uint8
    rgb = view_rgb[pix].astype(jnp.float32) / 255.0
    mask = buffers["mask"][ii, di, vi][pix]
    batch = {
        "rays_o": rays_o,
        "rays_d": viewdirs,
        "viewdirs": viewdirs,
        "target": rgb,
        "instance_mask": mask,
        "deg": buffers["deg"][di],
        "instance_id": ii,
        "articulation_id": di,
    }
    if src_hw is not None:
        h, w = src_hw
        src = view_rgb.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        batch["src_imgs"] = src.reshape(h, w, 3).transpose(2, 0, 1)
    return batch


def sample_view(
    buffers: Dict[str, jnp.ndarray], key: jax.Array
) -> Dict[str, jnp.ndarray]:
    """Draw one random (instance, articulation, view) and gather that view's
    whole image data (no pixel selection yet). Mirrors sample_multi_batch's
    view-draw semantics; pair with sample_view_pixels to split the per-view
    work (e.g. one ResNet encode) from the per-step pixel rays (the
    encode-reuse AE step, train/step_ae.py)."""
    n_i, n_d, n_v = buffers["rgb"].shape[:3]
    k_i, k_d, k_v = jax.random.split(key, 3)
    ii = jax.random.randint(k_i, (), 0, n_i)
    di = jax.random.randint(k_d, (), 0, n_d)
    vi = jax.random.randint(k_v, (), 0, n_v)
    return {
        "c2w": buffers["c2w"][ii, di, vi],  # (3, 4)
        "rgb": buffers["rgb"][ii, di, vi],  # (hw, 3) uint8
        "mask": buffers["mask"][ii, di, vi],  # (hw,)
        "deg": buffers["deg"][di],
        "instance_id": ii,
        "articulation_id": di,
    }


def view_src_image(view: Dict[str, jnp.ndarray], src_hw: Tuple[int, int]) -> jnp.ndarray:
    """(3, h, w) [-1, 1] source image of a sampled view (the reference's
    img_transform, sapien_multi.py:144) — same normalization as
    sample_multi_batch's src_imgs."""
    h, w = src_hw
    src = view["rgb"].astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return src.reshape(h, w, 3).transpose(2, 0, 1)


def sample_view_pixels(
    view: Dict[str, jnp.ndarray],
    directions: jnp.ndarray,
    key: jax.Array,
    batch_size: int,
) -> Dict[str, jnp.ndarray]:
    """``batch_size`` random pixel rays from a view drawn by sample_view —
    identical ray/target math to sample_multi_batch."""
    hw = view["rgb"].shape[0]
    pix = jax.random.randint(key, (batch_size,), 0, hw)
    c2w = view["c2w"]
    dirs = directions[pix]
    world_d = dirs @ c2w[:, :3].T
    viewdirs = world_d / jnp.linalg.norm(world_d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.broadcast_to(c2w[:, 3], viewdirs.shape),
        "rays_d": viewdirs,
        "viewdirs": viewdirs,
        "target": view["rgb"][pix].astype(jnp.float32) / 255.0,
        "instance_mask": view["mask"][pix],
        "deg": view["deg"],
        "instance_id": view["instance_id"],
        "articulation_id": view["articulation_id"],
    }


def sample_multi_batch_multiview(
    buffers: Dict[str, jnp.ndarray],
    key: jax.Array,
    batch_size: int,
    n_views: int,
    src_hw: Tuple[int, int],
) -> Dict[str, jnp.ndarray]:
    """``n_views`` independent (instance, articulation, view) draws, each
    contributing ``batch_size // n_views`` pixel rays, concatenated GROUPED
    BY VIEW (so (V, C) per-view latents broadcast onto the ray axis via
    models.articulated._broadcast_latent). Emits:
      src_imgs (V, 3, h, w), deg (V,), instance_id/articulation_id (V,),
      ray fields (V * per_view, ...).
    The auto-encoder uses this to amortize its ResNet encode over several
    source views per step (the reference's multi-view aggregation surface,
    resnet_encoder.py:428-446, turned into a throughput lever)."""
    per_view = batch_size // n_views
    keys = jax.random.split(key, n_views)
    stacked = jax.vmap(
        lambda k: sample_multi_batch(buffers, k, per_view, src_hw=src_hw)
    )(keys)
    out = {
        k: stacked[k].reshape(-1, *stacked[k].shape[2:])
        for k in ("rays_o", "rays_d", "viewdirs", "target")
    }
    out["instance_mask"] = stacked["instance_mask"].reshape(-1)
    out["src_imgs"] = stacked["src_imgs"]  # (V, 3, h, w)
    out["deg"] = stacked["deg"]  # (V,)
    out["instance_id"] = stacked["instance_id"]
    out["articulation_id"] = stacked["articulation_id"]
    return out


def _autodecoder_loss_fn(
    model, code_library, white_bkgd, near, far, randomized, reg_weight
) -> Callable:
    """Shared auto-decoder loss (reference LitNeRF_AutoDecoder.training_step,
    model_autodecoder.py:395-477: MSE0 + MSE1 + 1e-4 code-norm reg)."""

    def loss_fn(params, batch, render_key):
        latents = code_library.apply(
            params["codes"], batch["instance_id"], batch["articulation_id"]
        )
        latents = {k: jnp.atleast_2d(v) for k, v in latents.items()}
        out = model.apply(
            params["model"], batch, randomized, white_bkgd, near, far, latents,
            key=render_key,
        )
        loss0 = img2mse(out[0][0], batch["target"])
        loss1 = img2mse(out[1][0], batch["target"])
        reg = code_regularization(latents, weight=reg_weight)
        loss = loss1 + loss0 + reg
        return loss, (loss0, loss1, reg)

    return loss_fn


def make_autodecoder_train_step(
    model,
    code_library,
    tx: optax.GradientTransformation,
    white_bkgd: bool,
    near: float,
    far: float,
    randomized: bool = True,
    reg_weight: float = 1e-4,
    donate: bool = True,
    lr_fn: Callable = log_lerp_lr,
) -> Callable:
    """Train step for the articulated auto-decoder; ``params`` is
    {'model': ..., 'codes': ...} and both are optimized jointly by one Adam,
    as in configure_optimizers (model_autodecoder.py:604-606).

    Takes a fixed-shape host-sampled batch (see SapienMultiDataset).
    """
    loss_fn = _autodecoder_loss_fn(
        model, code_library, white_bkgd, near, far, randomized, reg_weight
    )

    def train_step(state: TrainState, batch, base_key) -> Tuple[TrainState, Dict]:
        render_key = jax.random.fold_in(base_key, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (loss0, loss1, reg)), grads = grad_fn(state.params, batch, render_key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "loss_reg": reg,
            "psnr0": mse2psnr(loss0),
            "psnr1": mse2psnr(loss1),
            "lr": lr_fn(state.step),
        }
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_autodecoder_device_train_step(
    model,
    code_library,
    tx: optax.GradientTransformation,
    white_bkgd: bool,
    near: float,
    far: float,
    batch_size: int = 4096,
    randomized: bool = True,
    reg_weight: float = 1e-4,
    donate: bool = True,
    lr_fn: Callable = log_lerp_lr,
    inner_steps: int = 1,
    mesh: Optional[Mesh] = None,
    sharded_views: bool = False,
) -> Callable:
    """Fully on-device auto-decoder step: multi-config batch sampling
    (sample_multi_batch) + render + losses + Adam fused into ONE compiled
    program; ``inner_steps`` > 1 scan-fuses that many optimizer steps per
    dispatch. step(state, buffers, base_key) -> (state, metrics); ``buffers``
    from SapienMultiDataset.device_buffers(), uploaded once.

    ``mesh`` with >1 chip on its 'data' axis enables data parallelism with
    the reference's DDP semantics (run.py:109-111; README.md:105 trains the
    articulated mode on 7 GPUs): each chip samples its OWN random (instance,
    articulation, view, ``batch_size`` pixels) — the per-chip PRNG key is
    fold_in(step_key, axis_index('data')) — and gradients are pmean'd, so
    the effective global batch is n_chips * batch_size. Params must be
    replicated (no tp on this path).

    ``sharded_views`` (requires a DDP mesh): the scene buffers arrive
    VIEW-SHARDED over 'data' (parallel.shard_multi_buffers) instead of
    replicated — each chip stores and samples only its n_views/n_chips view
    slice, so HBM per chip scales down with the mesh (the replicated path
    cannot hold the reference's real articulated scale on one chip). The
    sampler body is unchanged: inside shard_map it sees the local shapes.
    Sharded-vs-local-slice-oracle exactness is pinned by
    tests/test_parallel.py::TestShardedSceneBuffers."""
    loss_fn = _autodecoder_loss_fn(
        model, code_library, white_bkgd, near, far, randomized, reg_weight
    )
    axis = _data_axis(mesh)
    if sharded_views and axis is None:
        raise ValueError("sharded_views requires a mesh with >1 'data' chip")

    def one_step(state: TrainState, buffers, base_key):
        key = jax.random.fold_in(base_key, state.step)
        if axis is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        sample_key, render_key = jax.random.split(key)
        batch = sample_multi_batch(buffers, sample_key, batch_size)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        diff_params = state.params if axis is None else _pvary(state.params, axis)
        (loss, (loss0, loss1, reg)), grads = grad_fn(diff_params, batch, render_key)
        if axis is not None:  # DDP gradient all-reduce (the reference's NCCL)
            grads = jax.lax.pmean(grads, axis)
            loss, loss0, loss1, reg = jax.lax.pmean((loss, loss0, loss1, reg), axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "loss_reg": reg,
            "psnr0": mse2psnr(loss0),
            "psnr1": mse2psnr(loss1),
            "lr": lr_fn(state.step),
        }
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    if inner_steps <= 1:
        fn = one_step
    else:

        def fn(state, buffers, base_key):
            def body(carry, _):
                new_state, metrics = one_step(carry, buffers, base_key)
                return new_state, metrics

            state, metrics = jax.lax.scan(body, state, None, length=inner_steps)
            return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    if axis is not None:
        from aonerf.parallel import multi_buffer_specs

        fn = _ddp_shard_map(fn, mesh, multi_buffer_specs(sharded_views))
    return jax.jit(fn, donate_argnums=(0,) if donate else ())
