"""Multi-head ResNet34 image encoder (Flax).

Reference parity: models/resnet_encoder.py:67-531 (MultiHeadImgEncoder /
ImgEncoder_MultiHead_Art): ResNet34 backbone with BatchNorm converted to
InstanceNorm (affine-free) or GroupNorm(1) (resnet_encoder.py:23-63); stem +
layer1..layer3 shared; each head owns a private copy of layer4 followed by
global average pooling and a Linear: color (128), density (128), articulation
(32), optional global. 5-D (B, V, C, H, W) inputs run per view and aggregate
head outputs by mean or max (resnet_encoder.py:428-446).

Pretrained torchvision weights are not available in this image; ``init_from_
torch_state_dict`` maps a torch ResNet34 state dict onto the param tree when
one is supplied (conv NCHW->HWIO transpose, fc -> Dense). Random (he-normal)
init otherwise.

Inputs are NCHW float images in [-1, 1] (matching the reference's transform,
datasets/sapien_multi.py:144); convs run in NHWC internally for TPU layout.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_STAGE_BLOCKS = {"resnet34": (3, 4, 6, 3)}
_STAGE_WIDTHS = (64, 128, 256, 512)


def _instance_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Affine-free instance norm over spatial dims (NHWC), eps as torch.

    Statistics accumulate in f32 even under bf16 compute (a bf16 mean over
    76800 spatial positions loses ~2 decimal digits); the normalized result
    returns in the input dtype so the conv chain stays bf16."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) / jnp.sqrt(var + 1e-5)).astype(x.dtype)


class _Norm(nn.Module):
    norm_type: str = "instance"

    @nn.compact
    def __call__(self, x):
        if self.norm_type == "instance":
            return _instance_norm(x)
        if self.norm_type == "group":
            return nn.GroupNorm(num_groups=1)(x)
        raise ValueError(f"unsupported norm {self.norm_type!r} (batch needs running stats)")


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    norm_type: str = "instance"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1",
                    dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
        y = _Norm(self.norm_type)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2",
                    dtype=self.compute_dtype, param_dtype=jnp.float32)(y)
        y = _Norm(self.norm_type)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample",
                dtype=self.compute_dtype, param_dtype=jnp.float32,
            )(residual)
            residual = _Norm(self.norm_type)(residual)
        return nn.relu(y + residual)


class _Stage(nn.Module):
    features: int
    blocks: int
    stride: int
    norm_type: str = "instance"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            x = BasicBlock(
                self.features, stride=self.stride if i == 0 else 1,
                norm_type=self.norm_type, name=f"block{i}",
                compute_dtype=self.compute_dtype,
            )(x)
        return x


class MultiHeadImgEncoder(nn.Module):
    backbone: str = "resnet34"
    shared_layers: int = 3
    color_size: int = 128
    density_size: int = 128
    art_size: int = 32
    global_size: int = 0
    norm_type: str = "instance"
    agg_fct: str = "mean"
    # pixel-aligned feature-pyramid heads (reference 'spatials',
    # resnet_encoder.py:121-183): heads named here return a (B, C, h/2, w/2)
    # feature MAP (1x1 conv over the multiscale pyramid) instead of a vector.
    # NOTE: the reference's own spatials path is dimensionally inconsistent
    # (concats 3 extra input channels past its declared 1024); this is the
    # working version using the five 64/64/128/256/512 feature levels.
    spatials: Tuple[str, ...] = ()
    # bf16 convs roughly double the v5e MXU rate; norms still reduce in f32
    # (see _instance_norm) and head outputs return f32.
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """x: (B, 3, H, W) or (B, V, 3, H, W) in [-1, 1] -> dict of codes."""
        if x.ndim == 5:
            b, v = x.shape[:2]
            out = self(x.reshape(b * v, *x.shape[2:]))
            agg = jnp.mean if self.agg_fct == "mean" else jnp.max
            return {
                k: agg(o.reshape(b, v, *o.shape[1:]), axis=1) for k, o in out.items()
            }

        x = jnp.moveaxis(x, 1, -1)  # NCHW -> NHWC for TPU conv layout
        x = x.astype(self.compute_dtype)
        blocks = _STAGE_BLOCKS[self.backbone]

        # stem (/4)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1",
                    dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
        x = _Norm(self.norm_type)(x)
        x = nn.relu(x)
        stem = x  # /2 resolution: the pyramid's reference scale
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # shared stages
        pyramid = [stem]
        x = _Stage(64, blocks[0], 1, self.norm_type,
                   compute_dtype=self.compute_dtype, name="layer1")(x)
        pyramid.append(x)
        if self.shared_layers >= 2:
            x = _Stage(128, blocks[1], 2, self.norm_type,
                       compute_dtype=self.compute_dtype, name="layer2")(x)
            pyramid.append(x)
        if self.shared_layers >= 3:
            x = _Stage(256, blocks[2], 2, self.norm_type,
                       compute_dtype=self.compute_dtype, name="layer3")(x)
            pyramid.append(x)

        def head(name: str, out_size: int) -> jnp.ndarray:
            h = x
            for stage_idx in range(self.shared_layers, 4):
                h = _Stage(
                    _STAGE_WIDTHS[stage_idx], blocks[stage_idx], 2,
                    self.norm_type, compute_dtype=self.compute_dtype,
                    name=f"{name}_layer{stage_idx + 1}",
                )(h)
            if name in self.spatials:
                target = stem.shape[1:3]
                levels = [
                    jax.image.resize(p, (p.shape[0], *target, p.shape[-1]), "bilinear")
                    for p in pyramid + [h]
                ]
                feat = jnp.concatenate(levels, axis=-1)
                feat = nn.Conv(out_size, (1, 1), name=f"{name}_pix")(feat)
                return jnp.moveaxis(feat, -1, 1)  # (B, C, h/2, w/2)
            h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))  # global avg pool
            return nn.Dense(out_size, name=f"{name}_fc")(h)

        out = {}
        if self.global_size > 0:
            out["global"] = head("global", self.global_size)
        if self.color_size > 0:
            out["color"] = head("color", self.color_size)
        if self.density_size > 0:
            out["density"] = head("density", self.density_size)
        if self.art_size > 0:
            out["articulation"] = head("articulation", self.art_size)
        return out


def init_from_torch_state_dict(params: Dict, state_dict: Dict[str, np.ndarray]) -> Dict:
    """Graft torchvision ResNet34 weights onto the shared stages and every
    head's private layer4 copy. Conv weights transpose OIHW -> HWIO; norm
    affine params are dropped (instance norm is affine-free here, as in the
    reference's converted model)."""
    import copy

    params = copy.deepcopy(params)
    p = params["params"]

    def conv(t):
        return jnp.asarray(np.transpose(np.asarray(t), (2, 3, 1, 0)))

    p["conv1"]["kernel"] = conv(state_dict["conv1.weight"])

    def load_stage(dst, prefix, n_blocks):
        for i in range(n_blocks):
            blk = dst[f"block{i}"]
            blk["conv1"]["kernel"] = conv(state_dict[f"{prefix}.{i}.conv1.weight"])
            blk["conv2"]["kernel"] = conv(state_dict[f"{prefix}.{i}.conv2.weight"])
            if "downsample" in blk:
                blk["downsample"]["kernel"] = conv(
                    state_dict[f"{prefix}.{i}.downsample.0.weight"]
                )

    blocks = _STAGE_BLOCKS["resnet34"]
    for si in range(3):
        load_stage(p[f"layer{si + 1}"], f"layer{si + 1}", blocks[si])
    for head in ("global", "color", "density", "articulation"):
        key = f"{head}_layer4"
        if key in p:
            load_stage(p[key], "layer4", blocks[3])
    return params
