"""CLIP (ViT image tower + text tower) in Flax — the compression front-end.

Replaces the reference's ``open_clip`` dependency
(``cli/encode_images.py:18,69``; defaults ``ViT-B-32`` / ``openai``). The
default config below IS ViT-B/32: 224px, 32px patches, 12x768 vision tower
with QuickGELU, 12x512 causal text tower, 512-d joint space.

Weights are converted offline from HuggingFace ``CLIPModel`` or
OpenAI/open_clip checkpoints (:mod:`clip_codec_tpu.weights.convert_clip`);
runtime is pure JAX. Host-side preprocessing reproduces the open_clip eval
transform: BICUBIC resize of the short side to 224, center crop, CLIP
mean/std normalization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from PIL import Image

from .transformer import Transformer, quick_gelu

Dtype = Any

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


@dataclass(frozen=True)
class CLIPConfig:
    image_size: int = 224
    patch_size: int = 32
    vision_dim: int = 768
    vision_depth: int = 12
    vision_heads: int = 12
    vision_mlp: int = 3072
    text_dim: int = 512
    text_depth: int = 12
    text_heads: int = 8
    text_mlp: int = 2048
    vocab_size: int = 49408
    context_length: int = 77
    embed_dim: int = 512
    eos_token_id: int = 49407


VIT_B_32 = CLIPConfig()


class CLIPVisionTower(nn.Module):
    cfg: CLIPConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """pixels: (B, H, W, 3) normalized -> (B, embed_dim) unnormalized features."""
        c = self.cfg
        B = pixels.shape[0]
        p = nn.Conv(
            c.vision_dim, (c.patch_size, c.patch_size), strides=(c.patch_size, c.patch_size),
            use_bias=False, dtype=self.dtype, name="patch_embed",
        )(pixels.astype(self.dtype))
        p = p.reshape(B, -1, c.vision_dim)  # (B, N, D)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.vision_dim,), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, c.vision_dim)), p], axis=1)
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02), (n_pos, c.vision_dim), jnp.float32)
        x = x + pos.astype(self.dtype)[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_ln")(x)
        x = Transformer(
            c.vision_dim, c.vision_depth, c.vision_heads, c.vision_mlp,
            act=quick_gelu, dtype=self.dtype, name="encoder",
        )(x)
        cls_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="post_ln")(x[:, 0])
        proj = self.param("visual_projection", nn.initializers.normal(0.02), (c.vision_dim, c.embed_dim), jnp.float32)
        return cls_out @ proj.astype(self.dtype)


class CLIPTextTower(nn.Module):
    cfg: CLIPConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, L) int32 -> (B, embed_dim) unnormalized features.

        Features are taken at the EOT position — like open_clip, the argmax
        token id (EOT is the largest id in the CLIP vocab)."""
        c = self.cfg
        B, L = tokens.shape
        emb = nn.Embed(c.vocab_size, c.text_dim, dtype=self.dtype, name="token_embedding")(tokens)
        pos = self.param("position_embedding", nn.initializers.normal(0.01), (c.context_length, c.text_dim), jnp.float32)
        x = emb + pos.astype(self.dtype)[None, :L]
        mask = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1)[None, None]
        x = Transformer(
            c.text_dim, c.text_depth, c.text_heads, c.text_mlp,
            act=quick_gelu, dtype=self.dtype, name="encoder",
        )(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_ln")(x)
        eot = jnp.argmax(tokens, axis=-1)
        feats = x[jnp.arange(B), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02), (c.text_dim, c.embed_dim), jnp.float32)
        return feats @ proj.astype(self.dtype)


class CLIPModel(nn.Module):
    """Both towers under one param tree; call via the ``method=`` kwarg."""

    cfg: CLIPConfig = VIT_B_32
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual = CLIPVisionTower(self.cfg, dtype=self.dtype)
        self.text = CLIPTextTower(self.cfg, dtype=self.dtype)

    def encode_image(self, pixels: jax.Array) -> jax.Array:
        return self.visual(pixels)

    def encode_text(self, tokens: jax.Array) -> jax.Array:
        return self.text(tokens)

    def __call__(self, pixels: jax.Array, tokens: jax.Array):
        return self.encode_image(pixels), self.encode_text(tokens)


# ---------------------------------------------------------------- preprocessing

def preprocess_pil_u8(img: Image.Image, image_size: int = 224) -> np.ndarray:
    """open_clip eval transform, geometry only: short-side BICUBIC resize +
    center crop -> (H, W, 3) **uint8**. The mean/std normalize happens either
    on host (:func:`preprocess_pil`) or on device via the bit-exact
    :func:`clip_normalize_table` LUT — uint8 is the transfer format (4x less
    host->device traffic on the encode path)."""
    w, h = img.size
    # torchvision F.resize truncates the scaled long side with int(), not
    # round() — replicate exactly (1-px differences shift the crop grid).
    if w <= h:
        new_w, new_h = image_size, int(image_size * h / w)
    else:
        new_w, new_h = int(image_size * w / h), image_size
    # torchvision transform order: resize -> center crop -> THEN convert to
    # RGB (open_clip's _convert_to_rgb sits after the crop); converting first
    # changes pixels for palette/other-mode inputs.
    img = img.resize((new_w, new_h), Image.BICUBIC)
    w, h = img.size
    # torchvision center_crop: int(round((dim - crop)/2.0)) — round-half-even,
    # which differs from floor division when (dim - crop) % 4 == 3.
    left = int(round((w - image_size) / 2.0))
    top = int(round((h - image_size) / 2.0))
    img = img.crop((left, top, left + image_size, top + image_size)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def clip_normalize_table() -> np.ndarray:
    """(256, 3) float32: ``table[v, c]`` is EXACTLY the host's
    ``((v / 255.0) - CLIP_MEAN[c]) / CLIP_STD[c]`` fp32 value for every
    possible uint8 pixel — device-side normalize gathers this instead of
    re-deriving it arithmetically (TPU divides are not correctly-rounded
    IEEE, measured 1 ulp off the host on most inputs)."""
    v = (np.arange(256, dtype=np.float32) / 255.0)[:, None]  # (256, 1)
    return ((v - CLIP_MEAN) / CLIP_STD).astype(np.float32)


def preprocess_pil(img: Image.Image, image_size: int = 224) -> np.ndarray:
    """open_clip eval transform on host: short-side BICUBIC resize, center
    crop, CLIP mean/std normalize -> (H, W, 3) float32."""
    arr = preprocess_pil_u8(img, image_size).astype(np.float32) / 255.0
    return (arr - CLIP_MEAN) / CLIP_STD


def embed_m11_images(model: CLIPModel, params, images_m11: jax.Array) -> jax.Array:
    """Reference-faithful CLIP-alignment input path: raw ``[-1,1]`` pixels
    bilinear-resized to 224 with NO mean/std normalization
    (``train/diffusion_train.py:132`` feeds exactly this)."""
    B = images_m11.shape[0]
    x = jax.image.resize(images_m11, (B, 224, 224, images_m11.shape[-1]), method="bilinear", antialias=False)
    return model.apply(params, x, method=CLIPModel.encode_image)
