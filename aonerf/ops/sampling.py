"""Ray sampling: stratified coarse samples and inverse-CDF importance samples.

Reference parity:
  - cast_rays / sample_along_rays: models/vanilla_nerf/helper.py:25-26,106-133
  - sorted_piecewise_constant_pdf: helper.py:203-243 (the O(bins*samples)
    mask-matrix formulation is replaced by an equivalent rank-based inversion
    that XLA tiles onto the VPU; results are identical because both select
    bin0 = bins[last index with cdf <= u] and bin1 = bins[first index with
    cdf > u] on a monotone cdf)
  - sample_pdf: helper.py:246-252 (fine t detached, merged + sorted with
    coarse t_vals)

All shapes are static; randomness comes from explicit PRNG keys.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from aonerf.ops.sorting import bitonic_merge_sorted, sorted_uniform


def cast_rays(t_vals: jnp.ndarray, origins: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Points along rays: o + t*d. t_vals (..., S) -> points (..., S, 3)."""
    return origins[..., None, :] + t_vals[..., None] * directions[..., None, :]


def sample_along_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    num_samples: int,
    near: float,
    far: float,
    randomized: bool,
    lindisp: bool,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified sampling of ``num_samples + 1`` t-values in [near, far].

    Returns (t_vals (B, S+1), coords (B, S+1, 3)). When ``randomized``, each
    t-value is jittered uniformly within its bin (bins delimited by midpoints,
    with the first/last bin clamped at near/far), matching the reference.
    """
    bsz = rays_o.shape[0]
    dtype = rays_o.dtype
    t_vals = jnp.linspace(0.0, 1.0, num_samples + 1, dtype=dtype)
    if lindisp:
        t_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        t_vals = near * (1.0 - t_vals) + far * t_vals

    if randomized:
        if key is None:
            raise ValueError("randomized sampling requires a PRNG key")
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        upper = jnp.concatenate([mids, t_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([t_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, (bsz, num_samples + 1), dtype=dtype)
        t_vals = lower + (upper - lower) * t_rand
    else:
        t_vals = jnp.broadcast_to(t_vals, (bsz, num_samples + 1))

    coords = cast_rays(t_vals, rays_o, rays_d)
    return t_vals, coords


def sorted_piecewise_constant_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    key: Optional[jax.Array] = None,
    float_min_eps: float = 2.0**-32,
) -> jnp.ndarray:
    """Inverse-CDF sampling of a piecewise-constant PDF over sorted ``bins``.

    bins: (..., N)   sorted bin positions (N = num weights + 1)
    weights: (..., N-1)  non-negative bin masses
    Returns (..., num_samples) sorted-by-construction samples inside the bins'
    support. Weight-sum padding (eps=1e-5), cdf clipping at 1, and the
    degenerate-bin guard (0/0 -> 0, clipped to [0, 1]) follow the reference.
    """
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])],
        axis=-1,
    )  # (..., N) — same length as bins.

    if randomized:
        if key is None:
            raise ValueError("randomized PDF sampling requires a PRNG key")
        # Sorted uniforms drawn directly (exponential spacings): identical in
        # law to sorting iid uniforms, and it makes the output sorted (the
        # inverse CDF is monotone), so the fine-level merge needs no sort.
        u = sorted_uniform(key, (*cdf.shape[:-1], num_samples), dtype=cdf.dtype)
    else:
        u = jnp.linspace(0.0, 1.0 - float_min_eps, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], num_samples))

    # Bracketing bins via ONE-HOT MATMULS instead of gathers: TPU gathers are
    # the most expensive op of the whole sampling step (measured 51 ms vs
    # <2 ms for everything else at 4096x128), while the equivalent one-hot
    # contraction rides the MXU. The mask M[.., k, i] = (cdf_i <= u_k) is a
    # monotone True-prefix (cdf is non-decreasing), so
    #   idx0 = last True  = count-1          -> onehot0 = M & ~shift_left(M)
    #   idx1 = min(count, N-1) (first False, -> onehot1 = shift_right(M) & ~M,
    #          clamped to N-1 when all True)    + lastpos & M
    # These index selections are exactly the clamped comparison-count ones:
    # in fp32 the deterministic u_max = 1 - 2^-32 rounds to 1.0, count == N,
    # and both indices clamp to N-1 (bin0 = bin1 = bins[-1]) — precisely the
    # reference's mask-matrix result for that edge (helper.py:232-238).
    mask = cdf[..., None, :] <= u[..., :, None]  # (..., K, N) True-prefix
    m_next = jnp.concatenate(  # M_{i+1}, with M_N == False
        [mask[..., 1:], jnp.zeros_like(mask[..., :1])], axis=-1
    )
    m_prev = jnp.concatenate(  # M_{i-1}, with M_{-1} == True
        [jnp.ones_like(mask[..., :1]), mask[..., :-1]], axis=-1
    )
    onehot0 = (mask & ~m_next).astype(cdf.dtype)
    onehot1 = (m_prev & ~mask).astype(cdf.dtype)
    # all-True rows (count == N): idx1 clamps to N-1
    onehot1 = onehot1.at[..., -1].add(mask[..., -1].astype(cdf.dtype))

    def select(vals, onehot):
        return jnp.einsum(
            "...ki,...i->...k", onehot, vals, preferred_element_type=cdf.dtype
        )

    bin0 = select(bins, onehot0)
    bin1 = select(bins, onehot1)
    cdf0 = select(cdf, onehot0)
    cdf1 = select(cdf, onehot1)

    denom = cdf1 - cdf0
    t = jnp.clip(jnp.nan_to_num((u - cdf0) / denom, nan=0.0), 0.0, 1.0)
    samples = bin0 + t * (bin1 - bin0)
    return samples


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_vals: jnp.ndarray,
    num_samples: int,
    randomized: bool,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-resample fine t-values and merge (sorted) with coarse t_vals.

    The new samples carry no gradient (stop_gradient), as in the reference.
    Returns (t_vals (B, S_coarse+1+num_samples), coords (B, ..., 3)).

    TPU note: both inputs to the merge are sorted by construction (see
    sorted_piecewise_constant_pdf), so the reference's full sort
    (helper.py:250, torch.sort over 193 values/ray — the most expensive op
    of the step on TPU) is replaced by a log2(n)-stage bitonic merge with
    identical output.
    """
    t_samples = sorted_piecewise_constant_pdf(bins, weights, num_samples, randomized, key)
    t_samples = jax.lax.stop_gradient(t_samples)
    t_vals = bitonic_merge_sorted(t_vals, t_samples)
    coords = cast_rays(t_vals, origins, directions)
    return t_vals, coords
