"""Pre-LN transformer encoder shared by the CLIP and DINOv2 towers (layer L2).

The reference gets these architectures from ``open_clip`` / ``timm``
(``cli/encode_images.py:18,69``; ``cli/encode_images_dino.py:13,26``); here
they are native Flax so the whole encode path is one XLA program. Numerical
parity vs the HuggingFace implementations is asserted in
``tests/test_encoders.py`` with converted weights.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quick_gelu(x: jax.Array) -> jax.Array:
    """OpenAI CLIP activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections (HF CLIP layout)."""

    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        B, N, D = x.shape
        h, d = self.heads, self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
        if mask is not None:
            logits = logits + mask
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class TransformerBlock(nn.Module):
    """Pre-LN block: x + attn(ln1(x)); x + mlp(ln2(x))."""

    dim: int
    heads: int
    mlp_dim: int
    act: Callable = quick_gelu
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    # DINOv2 uses per-block LayerScale; CLIP does not.
    layer_scale: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln1")(x)
        y = MultiHeadAttention(self.dim, self.heads, dtype=self.dtype, name="attn")(y, mask)
        if self.layer_scale:
            y = y * self.param("ls1", nn.initializers.ones, (self.dim,), jnp.float32)
        x = x + y
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(y)
        y = self.act(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        if self.layer_scale:
            y = y * self.param("ls2", nn.initializers.ones, (self.dim,), jnp.float32)
        return x + y


class Transformer(nn.Module):
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    act: Callable = quick_gelu
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    layer_scale: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        for i in range(self.depth):
            x = TransformerBlock(
                self.dim, self.heads, self.mlp_dim, act=self.act, eps=self.eps,
                dtype=self.dtype, layer_scale=self.layer_scale, name=f"block_{i}",
            )(x, mask)
        return x
