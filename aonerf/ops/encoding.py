"""Sinusoidal positional encoding.

Reference parity: models/vanilla_nerf/helper.py:136-140 (pos_enc), including
the exact feature ordering: [x, sin(x*2^i  interleaved over dims),
cos(... as sin(phase+pi/2))].
"""

import jax.numpy as jnp
import numpy as np


def pos_enc(x: jnp.ndarray, min_deg: int, max_deg: int) -> jnp.ndarray:
    """Positional-encode the last axis of ``x``.

    Output layout (last axis), for D = x.shape[-1] and L = max_deg - min_deg:
      [ x (D),
        sin(2^min_deg * x) ... sin(2^(max_deg-1) * x)   (L*D, scale-major),
        cos(2^min_deg * x) ... cos(2^(max_deg-1) * x)   (L*D, scale-major) ]
    i.e. (2L + 1) * D features. The cosine block is computed as
    sin(phase + pi/2) to match the reference bit-for-bit.
    """
    if max_deg == min_deg:
        return x
    scales = jnp.asarray([2.0**i for i in range(min_deg, max_deg)], dtype=x.dtype)
    # (..., L, D) -> (..., L*D): scale-major ordering.
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    four_feat = jnp.sin(jnp.concatenate([xb, xb + 0.5 * np.pi], axis=-1))
    return jnp.concatenate([x, four_feat], axis=-1)


def pos_enc_dim(input_dim: int, min_deg: int, max_deg: int) -> int:
    """Feature size produced by :func:`pos_enc`."""
    return ((max_deg - min_deg) * 2 + 1) * input_dim
