"""Auto-encoder articulated NeRF: image-conditioned latents + joint state.

Reference parity: models/vanilla_nerf/model_ae_art.py (NeRF_AE_Art +
LitNeRF_AE_ART) — built WORKING here, where the reference's test path is
broken (SURVEY.md §2.2): a multi-head ResNet34 encoder predicts
shape/appearance/articulation codes from a source image; a JointStateDecoder
regresses the joint angle from the articulation code; the rendering field is
the articulated NeRF with relu sigma and (by default) ``embed_deg``:
the articulation code fed to the deformation MLP is an embedding of the
ROUNDED joint angle in degrees (nn.Embedding(91, 32), model_ae_art.py:239-240,
365-368) — at train time the ground-truth angle, at inference the predicted
one (which the reference never exercised).
"""

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aonerf.models.articulated import ArticulatedNeRF
from aonerf.models.joint_state import JointStateDecoder
from aonerf.models.resnet import MultiHeadImgEncoder

_XAVIER = nn.initializers.xavier_uniform()


class AutoEncoderArticulatedNeRF(nn.Module):
    num_coarse_samples: int = 64
    num_fine_samples: int = 128
    min_deg_point: int = 0
    max_deg_point: int = 10
    deg_view: int = 4
    noise_std: float = 0.0
    lindisp: bool = False
    embed_deg: bool = True
    # softplus: measured, the relu reference choice (model_ae_art.py:233)
    # leaves the field globally DEAD from early training at every lr tried on
    # the realistic config (exact-zero density -> zero gradient, no
    # recovery), while softplus always trains. Its side effect — softplus
    # density is never exactly 0, and the integrator's infinite last dist
    # (reference helper.py:163) then pins the full-ray acc at exactly 1 —
    # is handled by supervising the TAIL-FREE opacity instead
    # (ArticulatedNeRF.acc_minus_tail below). Set "relu" for strict parity.
    sigma_activation: str = "softplus"
    # Soft density cap (see ArticulatedNeRF.sigma_cap): without it the
    # jointly-trained encoder drives σ into f32 alpha saturation (acc == 1.0
    # exactly on every ray, all transmittance gradients underflow to zero)
    # within ~2k steps — measured, RESULTS.md. None disables (parity).
    sigma_cap: Optional[float] = 500.0
    compute_dtype: jnp.dtype = jnp.float32
    # Per-view latent kernel contraction (see ArticulatedNeRFMLP.latent_dense).
    latent_dense: bool = False

    def setup(self):
        self.encoder = MultiHeadImgEncoder(
            art_size=32, compute_dtype=self.compute_dtype
        )
        self.field = ArticulatedNeRF(
            num_coarse_samples=self.num_coarse_samples,
            num_fine_samples=self.num_fine_samples,
            min_deg_point=self.min_deg_point,
            max_deg_point=self.max_deg_point,
            deg_view=self.deg_view,
            noise_std=self.noise_std,
            lindisp=self.lindisp,
            sigma_activation=self.sigma_activation,
            sigma_cap=self.sigma_cap,
            tail_to_background=True,
            latent_dense=self.latent_dense,
            rgb_padding=0.0,
            embed_deg=self.embed_deg,
            compute_dtype=self.compute_dtype,
        )
        self.joint_state_decoder = JointStateDecoder(compute_dtype=self.compute_dtype)
        if self.embed_deg:
            # 0..90 degrees inclusive (model_ae_art.py:240)
            self.deg_embedding = nn.Embed(91, 32, embedding_init=_XAVIER)

    def encode(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """images: (B, 3, H, W) or (B, V, 3, H, W) -> latent dict."""
        return self.encoder(images)

    def predict_state(self, articulation_code: jnp.ndarray) -> jnp.ndarray:
        """Joint angle (radians) from the articulation code."""
        return self.joint_state_decoder(articulation_code)

    def deg_code(self, deg_rad: jnp.ndarray) -> jnp.ndarray:
        """Embedding of the rounded joint angle in degrees."""
        idx = jnp.clip(jnp.round(jnp.rad2deg(deg_rad)).astype(jnp.int32), 0, 90)
        return self.deg_embedding(idx)

    def render(
        self,
        rays: Dict[str, jnp.ndarray],
        randomized: bool,
        white_bkgd: bool,
        near: float,
        far: float,
        latents: Dict[str, jnp.ndarray],
        key: Optional[jax.Array] = None,
    ) -> List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        return self.field(rays, randomized, white_bkgd, near, far, latents, key=key)

    def __call__(
        self,
        rays: Dict[str, jnp.ndarray],
        src_imgs: jnp.ndarray,
        deg: jnp.ndarray,
        randomized: bool,
        white_bkgd: bool,
        near: float,
        far: float,
        key: Optional[jax.Array] = None,
    ):
        """Full AE forward: encode -> condition -> render.

        Returns (levels, latents, pred_state). ``deg`` (radians) selects the
        deg-embedding articulation condition at train time; pass the
        prediction itself at inference for the reference-intended behavior.
        """
        latents = self.encode(src_imgs)
        pred_state = self.predict_state(latents["articulation"])
        if self.embed_deg:
            latents = dict(latents)
            latents["articulation_deg"] = self.deg_code(deg)
        levels = self.render(rays, randomized, white_bkgd, near, far, latents, key=key)
        return levels, latents, pred_state
