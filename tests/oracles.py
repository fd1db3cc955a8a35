"""NumPy re-derivations of the reference rendering math, used as test oracles.

These are written independently from the aonerf jnp implementations (different
formulation wherever possible: explicit loops, literal cumulative products)
so a shared bug is unlikely to pass both.
"""

import numpy as np


def pos_enc_np(x, min_deg, max_deg):
    parts = [x]
    sins, coss = [], []
    for i in range(min_deg, max_deg):
        sins.append(np.sin(x * (2.0**i)))
        coss.append(np.sin(x * (2.0**i) + 0.5 * np.pi))
    return np.concatenate(parts + [np.concatenate(sins, -1), np.concatenate(coss, -1)], -1)


def stratified_tvals_np(num_samples, near, far, lindisp=False):
    t = np.linspace(0.0, 1.0, num_samples + 1, dtype=np.float64)
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    return near * (1.0 - t) + far * t


def volumetric_rendering_np(rgb, sigma, t_vals, dirs, white_bkgd):
    """Literal per-ray loop implementation of the integrator."""
    eps = 1e-10
    n_rays, n_samples = t_vals.shape
    comp_rgb = np.zeros((n_rays, 3))
    acc = np.zeros(n_rays)
    depth = np.zeros(n_rays)
    weights = np.zeros((n_rays, n_samples))
    for r in range(n_rays):
        dnorm = np.linalg.norm(dirs[r])
        trans = 1.0
        for s in range(n_samples):
            delta = (t_vals[r, s + 1] - t_vals[r, s]) if s + 1 < n_samples else 1e10
            delta *= dnorm
            alpha = 1.0 - np.exp(-sigma[r, s, 0] * delta)
            w = alpha * trans
            weights[r, s] = w
            comp_rgb[r] += w * rgb[r, s]
            depth[r] += w * t_vals[r, s]
            acc[r] += w
            trans *= 1.0 - alpha + eps
        if white_bkgd:
            comp_rgb[r] += 1.0 - acc[r]
    return comp_rgb, acc, weights, depth


def inverse_cdf_np(bins, weights, u):
    """Literal per-ray / per-sample scan of the piecewise-constant inverse CDF."""
    eps = 1e-5
    n_rays = bins.shape[0]
    out = np.zeros((n_rays, u.shape[-1]))
    for r in range(n_rays):
        w = weights[r].astype(np.float64).copy()
        wsum = w.sum()
        pad = max(0.0, eps - wsum)
        w += pad / len(w)
        wsum += pad
        pdf = w / wsum
        cdf = [0.0]
        run = 0.0
        for p in pdf[:-1]:
            run += p
            cdf.append(min(1.0, run))
        cdf.append(1.0)
        cdf = np.array(cdf)
        b = bins[r]
        for k, uu in enumerate(u[r]):
            # last index with cdf <= u
            i0 = int(np.max(np.nonzero(cdf <= uu)[0]))
            # first index with cdf > u
            gt = np.nonzero(cdf > uu)[0]
            i1 = int(np.min(gt)) if len(gt) else len(cdf) - 1
            denom = cdf[i1] - cdf[i0]
            t = 0.0 if denom == 0 else np.clip((uu - cdf[i0]) / denom, 0.0, 1.0)
            out[r, k] = b[i0] + t * (b[i1] - b[i0])
    return out


def ray_aabb_np(o, d, half):
    """Scalar slab test for one ray against the origin-centered cube."""
    tmin, tmax = -np.inf, np.inf
    valid = True
    prev_tmin, prev_tmax = None, None
    for axis in range(3):
        inv = 1.0 / d[axis]
        lo = (-half - o[axis]) * inv
        hi = (half - o[axis]) * inv
        lo, hi = min(lo, hi), max(lo, hi)
        if axis == 0:
            tmin, tmax = lo, hi
        else:
            if tmin > hi or lo > tmax:
                valid = False
            tmin = max(tmin, lo)
            tmax = min(tmax, hi)
    return valid, tmin, tmax


# ---------------------------------------------------------------------------
# Full-forward oracle: deterministic two-level hierarchical NeRF in fp64.
# Independent re-derivation (per-ray loops, literal formulas) used by the
# parity tests to check pixels and finite-difference gradients.


def nerf_mlp_np(p, xenc, venc):
    """p: flax param dict (numpy); xenc (R, S, 63); venc (R, 27).

    Returns (raw_rgb (R,S,3), raw_sigma (R,S,1)). Mirrors the reference MLP
    semantics (trunk with skip concat after layer 4, bottleneck + view branch).
    """
    r, s, f = xenc.shape
    x = xenc.reshape(-1, f)
    inputs = x
    for i in range(8):
        w, b = p[f"pts_{i}"]["kernel"], p[f"pts_{i}"]["bias"]
        x = np.maximum(x @ w + b, 0.0)
        if i == 4:
            x = np.concatenate([x, inputs], axis=-1)
    sigma = (x @ p["density"]["kernel"] + p["density"]["bias"]).reshape(r, s, 1)
    bott = x @ p["bottleneck"]["kernel"] + p["bottleneck"]["bias"]
    cond = np.repeat(venc[:, None, :], s, axis=1).reshape(r * s, -1)
    v = np.concatenate([bott, cond], axis=-1)
    w, b = p["views_0"]["kernel"], p["views_0"]["bias"]
    v = np.maximum(v @ w + b, 0.0)
    rgb = (v @ p["rgb"]["kernel"] + p["rgb"]["bias"]).reshape(r, s, 3)
    return rgb, sigma


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def articulated_mlp_np(p, pos, venc, latents):
    """fp64 oracle of ArticulatedNeRFMLP defaults (deformation_mlp=True,
    enc_after=True): reference model_autodecoder.py:171-235. p: flax param
    dict (numpy); pos (R, S, 3) RAW points; venc (R, 27); latents: dict of
    (1, C) or (V, C) codes. Returns (raw_rgb (R,S,3), raw_sigma (R,S,1))."""
    r, s, _ = pos.shape
    n = r * s

    def bcast(code):
        code = np.atleast_2d(code)
        return np.repeat(code, n // code.shape[0], axis=0)

    shape = bcast(latents["density"])
    app = bcast(latents["color"])
    art = bcast(latents["articulation"])
    pos_flat = pos.reshape(n, 3)

    x = np.concatenate([pos_flat, shape, art], axis=-1)
    for i in range(4):
        w, b = p[f"deform_{i}"]["kernel"], p[f"deform_{i}"]["bias"]
        x = np.maximum(x @ w + b, 0.0)
    x = x @ p["deform_out"]["kernel"] + p["deform_out"]["bias"] + pos_flat
    xenc = pos_enc_np(x, 0, 10)
    x = np.concatenate([xenc, shape], axis=-1)
    inputs = x
    for i in range(8):
        w, b = p[f"pts_{i}"]["kernel"], p[f"pts_{i}"]["bias"]
        x = np.maximum(x @ w + b, 0.0)
        if i == 4:
            x = np.concatenate([x, inputs], axis=-1)
    sigma = (x @ p["density"]["kernel"] + p["density"]["bias"]).reshape(r, s, 1)
    bott = x @ p["bottleneck"]["kernel"] + p["bottleneck"]["bias"]
    cond = np.repeat(venc[:, None, :], s, axis=1).reshape(n, -1)
    v = np.concatenate([bott, cond, app], axis=-1)
    for i in range(4):
        w, b = p[f"views_{i}"]["kernel"], p[f"views_{i}"]["bias"]
        v = np.maximum(v @ w + b, 0.0)
    rgb = (v @ p["rgb"]["kernel"] + p["rgb"]["bias"]).reshape(r, s, 3)
    return rgb, sigma


def _softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0.0)


def articulated_forward_np(
    params, latents, rays_o, rays_d, viewdirs, n_coarse, n_fine, near, far,
    white_bkgd, rgb_padding=0.001, density_bias=-1.0,
):
    """Deterministic two-level articulated hierarchy, fp64 (reference
    NeRF_AE_Art.forward, model_autodecoder.py:278-337: softplus sigma with
    bias, padded sigmoid rgb). params: {'coarse_mlp': ..., 'fine_mlp': ...}.
    Returns [(comp_rgb, acc, weights, depth)] per level."""
    r = rays_o.shape[0]
    venc = pos_enc_np(viewdirs, 0, 4)
    t = np.broadcast_to(stratified_tvals_np(n_coarse, near, far), (r, n_coarse + 1)).copy()
    out = []
    for level, name in enumerate(("coarse_mlp", "fine_mlp")):
        if level == 1:
            mids = 0.5 * (t[:, 1:] + t[:, :-1])
            u = np.broadcast_to(
                np.linspace(0.0, 1.0 - 2.0**-32, n_fine), (r, n_fine)
            )
            new_t = inverse_cdf_np(mids, weights[:, 1:-1], u)
            t = np.sort(np.concatenate([t, new_t], axis=-1), axis=-1)
        pts = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
        raw_rgb, raw_sigma = articulated_mlp_np(params[name], pts, venc, latents)
        rgb = _sigmoid(raw_rgb) * (1.0 + 2.0 * rgb_padding) - rgb_padding
        sigma = _softplus(raw_sigma + density_bias)
        comp, acc, weights, depth = volumetric_rendering_np(rgb, sigma, t, rays_d, white_bkgd)
        out.append((comp, acc, weights, depth))
    return out


def nerf_forward_np(params, rays_o, rays_d, viewdirs, n_coarse, n_fine, near, far, white_bkgd):
    """Deterministic full hierarchy. params: {'coarse_mlp': ..., 'fine_mlp': ...}.

    Returns [(comp_rgb, acc, weights, depth)] per level, all fp64.
    """
    r = rays_o.shape[0]
    venc = pos_enc_np(viewdirs, 0, 4)
    t = np.broadcast_to(stratified_tvals_np(n_coarse, near, far), (r, n_coarse + 1)).copy()
    out = []
    for level, name in enumerate(("coarse_mlp", "fine_mlp")):
        if level == 1:
            mids = 0.5 * (t[:, 1:] + t[:, :-1])
            u = np.broadcast_to(
                np.linspace(0.0, 1.0 - 2.0**-32, n_fine), (r, n_fine)
            )
            new_t = inverse_cdf_np(mids, weights[:, 1:-1], u)
            t = np.sort(np.concatenate([t, new_t], axis=-1), axis=-1)
        pts = rays_o[:, None, :] + t[..., None] * rays_d[:, None, :]
        xenc = pos_enc_np(pts, 0, 10)
        raw_rgb, raw_sigma = nerf_mlp_np(params[name], xenc, venc)
        rgb = _sigmoid(raw_rgb)
        sigma = np.maximum(raw_sigma, 0.0)
        comp, acc, weights, depth = volumetric_rendering_np(rgb, sigma, t, rays_d, white_bkgd)
        out.append((comp, acc, weights, depth))
    return out


# --------------------------------------------------------------------- LPIPS

# VGG16 .features structure, re-derived from the architecture itself (conv
# channel plan + maxpool placement), NOT imported from aonerf.eval.lpips:
# 13 convs of 3x3/pad1; maxpool after convs 2, 4, 7, 10 (and 13, which LPIPS
# never reaches past); LPIPS taps the relu AFTER convs 2, 4, 7, 10, 13
# (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
# torchvision nn.Sequential indices of the conv layers (conv,relu pairs with
# maxpools interleaved): derived by walking the plan.
_VGG16_CONV_TORCH_IDX = []
_i = 0
for _e in _VGG16_PLAN:
    if _e == "M":
        _i += 1
    else:
        _VGG16_CONV_TORCH_IDX.append(_i)
        _i += 2
_LPIPS_TAP_CONVS = (1, 3, 6, 9, 12)  # 0-based conv counts of the relu taps

# piqa/lpips input scaling constants (the official LPIPS ScalingLayer).
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float64)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float64)


def _conv3x3_np(x, kernel, bias):
    """'SAME' 3x3 conv, fp64, via explicit padding + sliding-window einsum.
    x (H, W, Cin); kernel (3, 3, Cin, Cout) HWIO; bias (Cout,)."""
    xp = np.pad(x.astype(np.float64), ((1, 1), (1, 1), (0, 0)))
    win = np.lib.stride_tricks.sliding_window_view(xp, (3, 3), axis=(0, 1))
    # win: (H, W, Cin, 3, 3) -> contract against kernel (3, 3, Cin, Cout)
    return np.einsum("hwcij,ijco->hwo", win, kernel.astype(np.float64)) + bias


def _maxpool2_np(x):
    h, w, c = x.shape
    return x[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2, c).max(axis=(1, 3))


def lpips_np(params, pred, target):
    """fp64 NumPy re-derivation of the LPIPS (VGG16) perceptual distance the
    reference computes through piqa (models/interface.py:113-123):
    scale inputs -> VGG16 features -> channel-unit-normalize each tap ->
    squared diff -> 1x1 linear head -> spatial mean -> sum over taps.

    params: the export_lpips_weights.py .npz layout (features_{i}_kernel/
    _bias HWIO, lin_{j}_kernel). pred/target: (H, W, 3) in [0, 1].
    """

    def features(img):
        x = img.astype(np.float64) * 2.0 - 1.0
        x = (x - _LPIPS_SHIFT) / _LPIPS_SCALE
        feats = []
        for ci, torch_idx in enumerate(_VGG16_CONV_TORCH_IDX):
            x = _conv3x3_np(
                x, params[f"features_{torch_idx}_kernel"],
                params[f"features_{torch_idx}_bias"],
            )
            x = np.maximum(x, 0.0)  # relu
            if ci in _LPIPS_TAP_CONVS:
                feats.append(x)
                if len(feats) == 5:
                    break
                x = _maxpool2_np(x)  # taps 1..4 precede a maxpool
        return feats

    fx, fy = features(pred), features(target)
    total = 0.0
    for j, (a, b) in enumerate(zip(fx, fy)):
        an = a / np.sqrt((a**2).sum(axis=-1, keepdims=True) + 1e-10)
        bn = b / np.sqrt((b**2).sum(axis=-1, keepdims=True) + 1e-10)
        d = (an - bn) ** 2
        w = params[f"lin_{j}_kernel"].astype(np.float64)
        total += (d * w).sum(axis=-1).mean()
    return total
