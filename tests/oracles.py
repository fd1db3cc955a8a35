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
