"""TPU-native sorted-sequence utilities: bitonic merge + sorted uniforms.

XLA's general sort is the single most expensive op in the hierarchical
sampling step on TPU (measured 38 ms of a ~120 ms train step at 4096 rays —
more than the whole coarse MLP forward). But the sampler never needs a
general sort: it merges the coarse t-values (sorted) with the fine PDF
samples, and those can be MADE sorted for free:

  - deterministic: u is a linspace, and the inverse CDF is monotone, so the
    samples are already sorted;
  - randomized: instead of sorting uniform draws, draw them sorted via
    exponential spacings (order-statistics identity: if E_1..E_{n+1} are iid
    Exp(1) and S_k = sum_{i<=k} E_i, then (S_1/S_{n+1}, ..., S_n/S_{n+1})
    has exactly the law of sorted iid uniforms).

Merging two sorted sequences is then a single bitonic merge: concatenating
an ascending and a descending sorted sequence gives a bitonic sequence,
which log2(n) compare-exchange stages sort — ~8 elementwise min/max passes
on the VPU, no data-dependent control flow.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def bitonic_merge_sorted(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Merge two ascending-sorted arrays along the last axis.

    a: (..., Na) sorted ascending; b: (..., Nb) sorted ascending.
    Returns (..., Na+Nb) sorted ascending. Padding (+inf) brings the working
    length to a power of two and is dropped from the tail afterwards.
    """
    na, nb = a.shape[-1], b.shape[-1]
    n_out = na + nb
    n = _next_pow2(n_out)
    pad = n - n_out
    inf = jnp.asarray(jnp.finfo(a.dtype).max, a.dtype)
    # ascending half gets the +inf padding (stays ascending), then the
    # reversed descending half: the concatenation is bitonic.
    asc = jnp.concatenate(
        [a, jnp.full((*a.shape[:-1], pad), inf, a.dtype)], axis=-1
    ) if pad else a
    c = jnp.concatenate([asc, b[..., ::-1]], axis=-1)  # (..., n)

    span = n // 2
    while span >= 1:
        shape = (*c.shape[:-1], n // (2 * span), 2, span)
        x = c.reshape(shape)
        lo = jnp.minimum(x[..., 0, :], x[..., 1, :])
        hi = jnp.maximum(x[..., 0, :], x[..., 1, :])
        c = jnp.stack([lo, hi], axis=-2).reshape(*c.shape[:-1], n)
        span //= 2
    return c[..., :n_out]


def sorted_uniform(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Sorted-ascending iid-uniform samples along the last axis, WITHOUT a
    sort, via normalized exponential spacings (see module docstring).

    Matches U(0, 1) order statistics exactly in law; the draws differ from
    sorting ``jax.random.uniform`` of the same key (different stream).
    """
    *batch, n = shape
    e = jax.random.exponential(key, (*batch, n + 1), dtype=dtype)
    s = jnp.cumsum(e, axis=-1)
    return s[..., :-1] / s[..., -1:]
