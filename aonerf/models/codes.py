"""Learned latent-code library for the auto-decoder articulated NeRF.

Reference parity: models/code_library.py:12-71 (CodeLibraryArticulated):
  - shape / appearance tables: (N_max_objs, obj_code_dim=128), xavier init
  - articulation table: (10, 32), xavier init
  - test-time articulation interpolation: 2*N-1 codes where even slots are the
    learned codes and odd slots are midpoints of their neighbors
"""

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_uniform()


class CodeLibraryArticulated(nn.Module):
    n_max_objs: int = 4
    obj_code_dim: int = 128
    n_max_articulations: int = 10
    art_code_dim: int = 32

    def setup(self):
        self.embedding_instance_shape = nn.Embed(
            self.n_max_objs, self.obj_code_dim, embedding_init=_XAVIER
        )
        self.embedding_instance_appearance = nn.Embed(
            self.n_max_objs, self.obj_code_dim, embedding_init=_XAVIER
        )
        self.embedding_instance_articulation = nn.Embed(
            self.n_max_articulations, self.art_code_dim, embedding_init=_XAVIER
        )

    def __call__(
        self,
        instance_id: jnp.ndarray,
        articulation_id: jnp.ndarray,
        is_test: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Look up latents by id. ids: int scalars or (B,).

        Training/val: articulation comes straight from the table. Test:
        ``articulation_id`` indexes the interpolated sweep of 2N-1 codes.
        """
        ret = {
            "density": self.embedding_instance_shape(instance_id),
            "color": self.embedding_instance_appearance(instance_id),
        }
        if is_test:
            interpolated = self.get_interpolated_articulations()
            ret["articulation"] = interpolated[articulation_id]
        else:
            ret["articulation"] = self.embedding_instance_articulation(articulation_id)
        return ret

    def get_interpolated_articulations(
        self, max_interpolations: int = 2
    ) -> jnp.ndarray:
        """(2N-1, art_code_dim): learned codes at even indices, neighbor
        midpoints at odd indices (code_library.py:55-71), fully vectorized."""
        if max_interpolations != 2:
            raise NotImplementedError("reference semantics define midpoints only")
        table = self.embedding_instance_articulation.embedding  # (N, C)
        mids = 0.5 * (table[:-1] + table[1:])  # (N-1, C)
        out = jnp.zeros(
            (self.n_max_articulations * 2 - 1, self.art_code_dim), dtype=table.dtype
        )
        out = out.at[0::2].set(table)
        out = out.at[1::2].set(mids)
        return out
