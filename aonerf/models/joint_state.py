"""Joint-state regressor: articulation latent (32) -> joint state (radians).

Reference parity: models/vanilla_nerf/model_autodecoder.py:42-57 /
model_ae_art.py:39-54 (JointStateDecoder): 32 -> 64 -> 32 -> 1 MLP with ReLU.
"""

import flax.linen as nn
import jax.numpy as jnp


class JointStateDecoder(nn.Module):
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        x = nn.relu(nn.Dense(64, dtype=self.compute_dtype, param_dtype=jnp.float32)(x))
        x = nn.relu(nn.Dense(32, dtype=self.compute_dtype, param_dtype=jnp.float32)(x))
        joint_state = nn.Dense(1, dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
        return joint_state.astype(jnp.float32)
