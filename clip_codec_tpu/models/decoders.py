"""Direct (non-diffusion) feed-forward decoders z -> image (layer L4).

Parity rebuilds of the reference decoders (``models/decoders.py:7-66``):
one-shot alternatives to diffusion decoding. The reference ships no training
loop for them (only the inference helper in ``train/train_decoder.py``);
see :mod:`clip_codec_tpu.train.train_decoder`.

Replicated quirk: ``CLIPCondDecoder`` counts upsample stages with
``len(stages)`` which grows by 3 per stage (``decoders.py:13``), so e.g.
``out_size=512`` builds only *two* x2 stages (8->16->32) and relies on the
final bilinear resize to reach the target. Faithfully reproduced — the stage
count, channel walk (halving, floored at 32) and resize placement all match.

Bilinear resizes use half-pixel centers (torch ``align_corners=False``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import DWConvBlock
from ..ops.groupnorm import group_norm

Dtype = Any


def _resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    # antialias=False matches torch F.interpolate(mode='bilinear',
    # align_corners=False), the op the reference uses for every resize.
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, h, w, C), method="bilinear", antialias=False)


class CLIPCondDecoder(nn.Module):
    """Single-path upsampling decoder conditioned only on the CLIP vector."""

    in_dim: int = 512
    base: int = 192
    out_size: int = 512
    dtype: Dtype = jnp.float32

    @staticmethod
    def stage_plan(base: int, out_size: int):
        """Replicates the reference's len(stages)-based loop (decoders.py:13-21)."""
        plan, c, n = [], base, 0
        while 8 * (2 ** (3 * n)) < out_size:
            nxt = max(c // 2, 32)
            plan.append((c, nxt))
            c = nxt
            n += 1
        return plan, c

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        B = z.shape[0]
        x = nn.Dense(self.base * 8 * 8, dtype=self.dtype, name="fc")(z.astype(self.dtype))
        x = nn.gelu(x, approximate=False)
        # NHWC seed: the torch view is (B, C, 8, 8); transpose for channel parity.
        x = x.reshape(B, self.base, 8, 8).transpose(0, 2, 3, 1)
        plan, c = self.stage_plan(self.base, self.out_size)
        for i, (cin, cout) in enumerate(plan):
            x = DWConvBlock(cin, cin, dtype=self.dtype, name=f"up_{i}_a")(x)
            x = _resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)
            x = DWConvBlock(cin, cout, dtype=self.dtype, name=f"up_{i}_b")(x)
        if x.shape[1] != self.out_size:
            x = _resize_bilinear(x, self.out_size, self.out_size)
        x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="to_img")(x)
        return jnp.tanh(x)


class FeatureToImageDecoderLite(nn.Module):
    """Progressive x8 upsampler with plain conv blocks (decoders.py:32-66)."""

    in_dim: int = 512
    base: int = 256
    out_size: int = 64
    dtype: Dtype = jnp.float32

    def _block(self, x, cout: int, name: str):
        for k in range(2):
            x = nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"{name}_conv{k}")(x)
            scale = self.param(f"{name}_gn{k}_scale", nn.initializers.ones, (cout,), jnp.float32)
            bias = self.param(f"{name}_gn{k}_bias", nn.initializers.zeros, (cout,), jnp.float32)
            x = group_norm(x, (scale, bias), groups=8)
            x = nn.gelu(x, approximate=False)
        return x

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        B = z.shape[0]
        h = self.out_size // 8
        c = self.base
        x = nn.Dense(c * h * h, dtype=self.dtype, name="fc")(z.astype(self.dtype))
        x = nn.gelu(x, approximate=False)
        x = x.reshape(B, c, h, h).transpose(0, 2, 3, 1)
        x = self._block(x, c, "up1")
        x = _resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)
        x = self._block(x, c // 2, "up2")
        x = _resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)
        x = self._block(x, c // 4, "up3")
        x = _resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2)
        x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="to_img")(x)
        return jnp.tanh(x)
