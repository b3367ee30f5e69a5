"""DINOv2 image encoder (layer L2 alternative front-end) in Flax.

Replaces the reference's timm dependency
(``cli/encode_images_dino.py:13,26``; default model
``vit_base_patch14_dinov2.lvd142m``: 768-d, 12 layers, 14px patches, 518px
input, LayerScale, exact-GELU MLP). The reference's preprocessing — bilinear
resize to the model's input size + ImageNet mean/std, per image
(``encode_images_dino.py:27-36``) — is reproduced in
:func:`preprocess_dino`. Output embedding is the final-LayerNorm CLS token,
matching ``timm.create_model(..., num_classes=0)``.

Weights convert from a HuggingFace ``Dinov2Model`` state_dict
(:func:`convert_dino_hf`); parity vs HF asserted in tests/test_encoders.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .transformer import Transformer

Dtype = Any

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


@dataclass(frozen=True)
class DinoConfig:
    image_size: int = 518
    patch_size: int = 14
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    eps: float = 1e-6


DINOV2_BASE = DinoConfig()


class DinoV2(nn.Module):
    cfg: DinoConfig = DINOV2_BASE
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: (B, H, W, 3) normalized -> (B, dim) CLS embedding."""
        c = self.cfg
        B = pixels.shape[0]
        p = nn.Conv(
            c.dim, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
            dtype=self.dtype, name="patch_embed",
        )(pixels.astype(self.dtype))
        p = p.reshape(B, -1, c.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.dim), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, c.dim)), p], axis=1)
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("position_embeddings", nn.initializers.zeros, (1, n_pos, c.dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        x = Transformer(
            c.dim, c.depth, c.heads, c.dim * c.mlp_ratio,
            act=partial(nn.gelu, approximate=False), eps=c.eps, layer_scale=True,
            dtype=self.dtype, name="encoder",
        )(x)
        x = nn.LayerNorm(epsilon=c.eps, dtype=self.dtype, name="final_ln")(x)
        return x[:, 0]


def preprocess_dino(img_m01: np.ndarray, image_size: int = 518) -> np.ndarray:
    """(H, W, 3) float in [0,1] -> bilinear resize + ImageNet normalize,
    matching the reference's manual timm transform
    (``encode_images_dino.py:27-36``: plain resize, no crop; torch
    F.interpolate semantics = half-pixel, no antialias).

    Runs on the host CPU backend: this sits inside the per-image loading loop,
    and an accelerator resize there would add a device round trip plus one
    compile per distinct source resolution."""
    with jax.default_device(jax.devices("cpu")[0]):
        x = jax.image.resize(
            jnp.asarray(img_m01, jnp.float32), (image_size, image_size, 3),
            method="bilinear", antialias=False,
        )
        return np.asarray((x - IMAGENET_MEAN) / IMAGENET_STD)


def embed_m11_images_dino(model: "DinoV2", params, images_m11, image_size: int = 518):
    """In-graph DINO-alignment input path for the SD trainer (reference
    ``train/sd_diffusion_train.py:247-251``): ``[-1,1]`` pixels -> [0,1],
    bilinear resize to the model's input size (align_corners=False, no
    antialias — torch F.interpolate semantics), ImageNet normalize, embed.
    Differentiable; ``params`` ride the jit as an argument."""
    import jax
    import jax.numpy as jnp

    x = (jnp.clip(images_m11, -1.0, 1.0) + 1.0) / 2.0
    B = x.shape[0]
    x = jax.image.resize(x, (B, image_size, image_size, 3), method="bilinear", antialias=False)
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return model.apply(params, x).astype(jnp.float32)


def convert_dino_hf(sd: Mapping, depth: int = 12) -> Dict:
    """HuggingFace ``Dinov2Model`` state_dict -> params for :class:`DinoV2`."""
    from ..weights.convert import _np, linear

    def ln(prefix):
        return {
            "scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
            "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32),
        }

    params: Dict = {
        "patch_embed": {
            "kernel": _np(sd["embeddings.patch_embeddings.projection.weight"]).transpose(2, 3, 1, 0).astype(np.float32),
            "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]).astype(np.float32),
        },
        "cls_token": _np(sd["embeddings.cls_token"]).astype(np.float32),
        "position_embeddings": _np(sd["embeddings.position_embeddings"]).astype(np.float32),
        "final_ln": ln("layernorm"),
        "encoder": {},
    }
    for i in range(depth):
        pre = f"encoder.layer.{i}"
        params["encoder"][f"block_{i}"] = {
            "ln1": ln(f"{pre}.norm1"),
            "ln2": ln(f"{pre}.norm2"),
            "attn": {
                "q_proj": linear(sd, f"{pre}.attention.attention.query"),
                "k_proj": linear(sd, f"{pre}.attention.attention.key"),
                "v_proj": linear(sd, f"{pre}.attention.attention.value"),
                "out_proj": linear(sd, f"{pre}.attention.output.dense"),
            },
            "fc1": linear(sd, f"{pre}.mlp.fc1"),
            "fc2": linear(sd, f"{pre}.mlp.fc2"),
            "ls1": _np(sd[f"{pre}.layer_scale1.lambda1"]).astype(np.float32),
            "ls2": _np(sd[f"{pre}.layer_scale2.lambda1"]).astype(np.float32),
        }
    return params
