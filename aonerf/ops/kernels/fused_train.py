"""Differentiable fused ray-march: custom-VJP around the Pallas kernels.

Training-path counterpart of fused_render.fused_render_level. The backward
pass is its own Pallas kernel that RECOMPUTES the forward activations per
ray tile (flash-attention-style rematerialization: nothing but the kernel
inputs is saved between fwd and bwd) and accumulates the weight gradients in
VMEM across grid steps. Neither pass ever writes a (rays*samples, 256)
activation to HBM — the XLA pipeline writes ~3x of them per trunk layer.

Gradients flow to the MLP WEIGHTS only. Sample positions carry no gradient
by construction in this architecture: coarse t-values are parameter-free and
fine t-values are detached (reference helper.py:249), so xenc/t/d/cond
cotangents are zero. The integrator backward is analytic:

  w_i = alpha_i * T_i,   T_i = prod_{j<i}(1 - alpha_j + eps)
  dL/dalpha_i = g_w_i * T_i - (1/(1-alpha_i+eps)) * sum_{j>i} g_w_j * w_j

with the suffix sum computed as a strictly-upper-triangular matmul (MXU).

STATUS (round 2): demoted to a correctness cross-check, not the production
path. The kernel's win was eliminating HBM activation round-trips in the
large-batch regime; the small-batch (224-ray) VMEM-resident XLA step made
that moot (122.6K vs 47.0K rays/s), and the roofline in RESULTS.md shows the
XLA step already streams at/above the bare bf16 matmul-chain rate of its own
layer shapes — there is no headroom left for a hand kernel at this model
width. Kept because it exercises the Pallas path end-to-end (custom-VJP,
recompute-in-bwd, VMEM weight-grad accumulation) and pins the jnp path's
numerics (tests/test_kernels.py).
"""

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aonerf.ops.kernels.fused_render import (
    _WEIGHT_NAMES,
    fused_render_level,
    mlp_params_from_flax,  # noqa: F401 (re-export convenience)
)

_EPS = 1e-10


def _dot(a, b, bf16):
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t(a, b, bf16):
    """a^T @ b with a (rows, M), b (rows, N) -> (M, N)."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _bwd_kernel(
    t_ref, o_ref, d_ref, cond_ref, xenc_ref,
    g_comp_ref, g_acc_ref, g_depth_ref, g_weights_ref,
    *refs,
    S: int, white_bkgd: bool, dot_bf16: bool,
):
    w = {name: refs[i][:] for i, name in enumerate(_WEIGHT_NAMES)}
    grad_refs = dict(zip(_WEIGHT_NAMES, refs[len(_WEIGHT_NAMES):]))
    f32 = jnp.float32
    bf16 = dot_bf16

    # ---------------- forward recompute (activations stay in VMEM)
    xe = xenc_ref[:]
    rows = xe.shape[0]
    rt = rows // S

    # Keep stored activations in bf16 when bf16 dots are on: they feed the
    # backward matmuls as bf16 anyway and it halves the VMEM footprint.
    keep = (lambda a: a.astype(jnp.bfloat16)) if bf16 else (lambda a: a)
    hs = []  # h0..h7
    x = jnp.maximum(_dot(xe, w["w0"], bf16) + w["b0"], 0.0)
    hs.append(keep(x))
    for i in (1, 2, 3, 4):
        x = jnp.maximum(_dot(x, w[f"w{i}"], bf16) + w[f"b{i}"], 0.0)
        hs.append(keep(x))
    x = jnp.maximum(_dot(x, w["w5x"], bf16) + _dot(xe, w["w5i"], bf16) + w["b5"], 0.0)
    hs.append(keep(x))
    for i in (6, 7):
        x = jnp.maximum(_dot(x, w[f"w{i}"], bf16) + w[f"b{i}"], 0.0)
        hs.append(keep(x))
    h7 = hs[7]

    raw_sigma = _dot(h7, w["wd"], bf16) + w["bd"]  # (rows, 1)
    btl = _dot(h7, w["wb"], bf16) + w["bb"]
    cond = cond_ref[:]
    c_part = _dot(cond, w["wvb"], bf16)  # (RT, 128)
    c_rows = jnp.broadcast_to(c_part[:, None, :], (rt, S, c_part.shape[-1])).reshape(rows, -1)
    zv = _dot(btl, w["wva"], bf16) + c_rows + w["bv"]
    hv = jnp.maximum(zv, 0.0)
    raw_rgb = _dot(hv, w["wr"], bf16) + w["br"]  # (rows, 3)

    t = t_ref[:]
    d = d_ref[:]
    dnorm = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    dists = jnp.concatenate(
        [t[:, 1:] - t[:, :-1], jnp.full((rt, 1), 1e10, f32)], axis=-1
    ) * dnorm
    sigma = jnp.maximum(raw_sigma.reshape(rt, S), 0.0)
    expterm = jnp.exp(-sigma * dists)
    alpha = 1.0 - expterm
    v = jnp.maximum(1.0 - alpha + _EPS, _EPS)
    logv = jnp.log(v)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    strict_lower_t = (col_ids > row_ids).astype(f32)  # (S,S): [i,j]=1 if j>i
    # T_i = exp(sum_{j<i} logv_j): logv @ strict_lower (mask[j,i]=1 for j<i)
    trans = jnp.exp(_dot(logv, (col_ids < row_ids).astype(f32).T, False))
    weights = alpha * trans  # (RT, S)
    rgb = jax.nn.sigmoid(raw_rgb).reshape(rt, S, 3)

    # ---------------- integrator backward
    g_comp = g_comp_ref[:]  # (RT, 3)
    g_acc = g_acc_ref[:][:, 0]  # (RT,)
    g_depth = g_depth_ref[:][:, 0]
    g_weights_direct = g_weights_ref[:]  # (RT, S)

    g_w = jnp.sum(g_comp[:, None, :] * rgb, axis=-1)  # (RT, S)
    if white_bkgd:
        g_w = g_w - jnp.sum(g_comp, axis=-1)[:, None]
    g_w = g_w + g_acc[:, None] + g_depth[:, None] * t + g_weights_direct

    gww = g_w * weights  # (RT, S)
    # suffix sums: S_i = sum_{j>i} gww_j  -> gww @ mask[j,i]=1 if j>i == strict_lower_t^T...
    suffix = _dot(gww, strict_lower_t.T, False)  # out[:, i] = sum_j gww_j * [j > i]
    g_alpha = g_w * trans - suffix / v
    g_raw_sigma = (
        g_alpha * expterm * dists * (raw_sigma.reshape(rt, S) > 0.0)
    ).reshape(rows, 1)

    g_rgb = (g_comp[:, None, :] * weights[..., None]).reshape(rows, 3)
    sig = rgb.reshape(rows, 3)
    g_raw_rgb = g_rgb * sig * (1.0 - sig)

    # ---------------- MLP backward with in-VMEM dW accumulation
    first = pl.program_id(0) == 0

    def acc_grad(name, val):
        @pl.when(first)
        def _():
            grad_refs[name][:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            grad_refs[name][:] = grad_refs[name][:] + val

    def bias_grad(delta):
        return jnp.sum(delta, axis=0, keepdims=True)

    acc_grad("wr", _dot_t(hv, g_raw_rgb, bf16))
    acc_grad("br", bias_grad(g_raw_rgb))
    g_hv = _dot(g_raw_rgb, w["wr"].T, bf16)
    delta_v = g_hv * (zv > 0.0)
    acc_grad("wva", _dot_t(btl, delta_v, bf16))
    acc_grad("bv", bias_grad(delta_v))
    g_btl = _dot(delta_v, w["wva"].T, bf16)
    # per-ray sum of delta_v for the view-encoding half
    g_c_ray = jnp.sum(delta_v.reshape(rt, S, -1), axis=1)  # (RT, 128)
    acc_grad("wvb", _dot_t(cond, g_c_ray, bf16))

    acc_grad("wb", _dot_t(h7, g_btl, bf16))
    acc_grad("bb", bias_grad(g_btl))
    acc_grad("wd", _dot_t(h7, g_raw_sigma, bf16))
    acc_grad("bd", bias_grad(g_raw_sigma))

    g_h = _dot(g_btl, w["wb"].T, bf16) + _dot(g_raw_sigma, w["wd"].T, bf16)
    for i in (7, 6):
        delta = g_h * (hs[i].astype(jnp.float32) > 0.0)
        acc_grad(f"w{i}", _dot_t(hs[i - 1], delta, bf16))
        acc_grad(f"b{i}", bias_grad(delta))
        g_h = _dot(delta, w[f"w{i}"].T, bf16)
    # layer 5: split weights (skip connection)
    delta = g_h * (hs[5].astype(jnp.float32) > 0.0)
    acc_grad("w5x", _dot_t(hs[4], delta, bf16))
    acc_grad("w5i", _dot_t(xe, delta, bf16))
    acc_grad("b5", bias_grad(delta))
    g_h = _dot(delta, w["w5x"].T, bf16)
    for i in (4, 3, 2, 1):
        delta = g_h * (hs[i].astype(jnp.float32) > 0.0)
        acc_grad(f"w{i}", _dot_t(hs[i - 1], delta, bf16))
        acc_grad(f"b{i}", bias_grad(delta))
        g_h = _dot(delta, w[f"w{i}"].T, bf16)
    delta = g_h * (hs[0].astype(jnp.float32) > 0.0)
    acc_grad("w0", _dot_t(xe, delta, bf16))
    acc_grad("b0", bias_grad(delta))


@functools.partial(
    jax.jit, static_argnames=("white_bkgd", "ray_tile", "interpret", "dot_bf16")
)
def _fused_level_bwd_impl(
    kernel_params: Dict[str, jnp.ndarray],
    t_vals, rays_o, rays_d, viewdirs_enc, samples_enc,
    g_comp, g_acc, g_depth, g_weights,
    white_bkgd: bool, ray_tile: int, interpret: bool, dot_bf16: bool,
) -> Dict[str, jnp.ndarray]:
    R, S = t_vals.shape
    dpos = samples_enc.shape[-1]
    xenc = samples_enc.reshape(R * S, dpos)
    n_tiles = R // ray_tile
    rows_tile = ray_tile * S
    weight_list = [kernel_params[n].astype(jnp.float32) for n in _WEIGHT_NAMES]

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((ray_tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, viewdirs_enc.shape[-1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, dpos), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weight_list],
        # dW outputs: whole arrays, revisited every grid step (accumulated)
        out_specs=[
            pl.BlockSpec(wl.shape, (lambda i, n=wl.ndim: (0,) * n), memory_space=pltpu.VMEM)
            for wl in weight_list
        ],
    )
    grads = pl.pallas_call(
        functools.partial(
            _bwd_kernel, S=S, white_bkgd=white_bkgd, dot_bf16=dot_bf16
        ),
        out_shape=[jax.ShapeDtypeStruct(wl.shape, jnp.float32) for wl in weight_list],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        t_vals, rays_o, rays_d, viewdirs_enc, xenc,
        g_comp, g_acc.reshape(R, 1), g_depth.reshape(R, 1), g_weights,
        *weight_list,
    )
    return dict(zip(_WEIGHT_NAMES, grads))


def make_fused_level(white_bkgd: bool, ray_tile: int = 16, interpret: bool = False,
                     dot_bf16: bool = False):
    """A differentiable fused level renderer with the Pallas fwd+bwd pair.

    Returns fn(kernel_params, t_vals, rays_o, rays_d, viewdirs_enc,
    samples_enc) -> (comp_rgb, acc, depth, weights); gradients flow to
    kernel_params only (sample positions are parameter-free or detached in
    this architecture — see module docstring).
    """

    @jax.custom_vjp
    def fused_level(kernel_params, t_vals, rays_o, rays_d, viewdirs_enc, samples_enc):
        return fused_render_level(
            kernel_params, t_vals, rays_o, rays_d, viewdirs_enc, samples_enc,
            white_bkgd, ray_tile=ray_tile, interpret=interpret, dot_bf16=dot_bf16,
        )

    def fwd(kernel_params, t_vals, rays_o, rays_d, viewdirs_enc, samples_enc):
        out = fused_render_level(  # call the primal impl, not the vjp wrapper
            kernel_params, t_vals, rays_o, rays_d, viewdirs_enc, samples_enc,
            white_bkgd, ray_tile=ray_tile, interpret=interpret, dot_bf16=dot_bf16,
        )
        residuals = (kernel_params, t_vals, rays_o, rays_d, viewdirs_enc, samples_enc)
        return out, residuals

    def bwd(residuals, cotangents):
        kernel_params, t_vals, rays_o, rays_d, viewdirs_enc, samples_enc = residuals
        g_comp, g_acc, g_depth, g_weights = cotangents
        dkp = _fused_level_bwd_impl(
            kernel_params, t_vals, rays_o, rays_d, viewdirs_enc, samples_enc,
            g_comp, g_acc, g_depth, g_weights,
            white_bkgd, ray_tile, interpret, dot_bf16,
        )
        zeros = lambda x: jnp.zeros_like(x)
        return (dkp, zeros(t_vals), zeros(rays_o), zeros(rays_d),
                zeros(viewdirs_enc), zeros(samples_enc))

    fused_level.defvjp(fwd, bwd)
    return fused_level


def fused_nerf_forward(
    params,
    rays,
    white_bkgd: bool,
    near: float,
    far: float,
    key=None,
    num_coarse_samples: int = 64,
    num_fine_samples: int = 128,
    randomized: bool = True,
    ray_tile_coarse: int = 16,
    ray_tile_fine: int = 8,
    dot_bf16: bool = False,
    interpret: bool = False,
):
    """Full two-level hierarchical NeRF forward on the fused kernels.

    Drop-in replacement for NeRF.__call__ given the same flax ``params``
    (model.py:147-199 semantics); sampling/PDF stages stay in jnp (they are
    cheap and gather/sort-shaped), both MLP+integrate stages run fused.
    Returns [(comp_rgb, acc, depth)] per level.
    """
    from aonerf.ops import encoding, sampling

    level_c = make_fused_level(
        white_bkgd, ray_tile=ray_tile_coarse, interpret=interpret, dot_bf16=dot_bf16
    )
    level_f = make_fused_level(
        white_bkgd, ray_tile=ray_tile_fine, interpret=interpret, dot_bf16=dot_bf16
    )
    p = params["params"] if "params" in params else params
    kp_c = mlp_params_from_flax(p["coarse_mlp"])
    kp_f = mlp_params_from_flax(p["fine_mlp"])

    keys = jax.random.split(key, 2) if key is not None else (None, None)
    o, d, vd = rays["rays_o"], rays["rays_d"], rays["viewdirs"]
    venc = encoding.pos_enc(vd, 0, 4)

    t_vals, samples = sampling.sample_along_rays(
        o, d, num_coarse_samples, near, far, randomized, False, key=keys[0]
    )
    xenc = encoding.pos_enc(samples, 0, 10)
    comp0, acc0, depth0, weights0 = level_c(kp_c, t_vals, o, d, venc, xenc)

    t_mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
    t_fine, samples_f = sampling.sample_pdf(
        t_mids, weights0[..., 1:-1], o, d, t_vals, num_fine_samples,
        randomized, key=keys[1],
    )
    xenc_f = encoding.pos_enc(samples_f, 0, 10)
    comp1, acc1, depth1, _ = level_f(kp_f, t_fine, o, d, venc, xenc_f)
    return [(comp0, acc0, depth0), (comp1, acc1, depth1)]


def make_fused_vanilla_train_multi_step(
    tx,
    white_bkgd: bool,
    near: float,
    far: float,
    batch_size: int = 4096,
    inner_steps: int = 10,
    num_coarse_samples: int = 64,
    num_fine_samples: int = 128,
    randomized: bool = True,
    ray_tile_coarse: int = 16,
    ray_tile_fine: int = 8,
    dot_bf16: bool = True,
    donate: bool = True,
    lr_fn=None,
):
    """Scan-fused vanilla train step running the Pallas fwd+bwd kernels.

    Drop-in alternative to aonerf.train.step.make_vanilla_train_multi_step
    operating on the same flax NeRF params pytree (grads flow through the
    kernel-weight extraction back into the tree).
    """
    import optax

    from aonerf.ops.math import img2mse, mse2psnr
    from aonerf.train.lr import log_lerp_lr
    from aonerf.train.step import TrainState, sample_ray_batch

    if lr_fn is None:
        lr_fn = log_lerp_lr

    def loss_fn(params, batch, render_key):
        out = fused_nerf_forward(
            params, batch, white_bkgd, near, far, key=render_key,
            num_coarse_samples=num_coarse_samples,
            num_fine_samples=num_fine_samples,
            randomized=randomized,
            ray_tile_coarse=ray_tile_coarse, ray_tile_fine=ray_tile_fine,
            dot_bf16=dot_bf16,
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
