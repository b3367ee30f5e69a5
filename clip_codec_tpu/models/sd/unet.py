"""SD-1.5 conditional UNet (``UNet2DConditionModel``) in Flax, NHWC.

The frozen denoiser of the latent path (reference loads it from diffusers,
``models/sd_decoder.py:40``). Config defaults are SD-1.5: 4-ch latents,
block widths (320, 640, 1280, 1280), 2 resnets per block, cross-attention to
a 768-d context with 8 heads, concat skip connections.

Sized-down configs (tiny widths) are used for tests; released checkpoints
convert via :mod:`clip_codec_tpu.weights.convert_sd`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Downsample2D, ResnetBlock2D, Transformer2D, Upsample2D, group_norm32

Dtype = Any


@dataclass(frozen=True)
class SDUNetConfig:
    in_ch: int = 4
    out_ch: int = 4
    block_out: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_dim: int = 768
    heads: int = 8
    # block i has cross-attention iff cross_attn[i] (SD-1.5: last down block
    # and first up block are attention-free)
    freq_dim: int = 320

    @property
    def temb_dim(self) -> int:
        return self.block_out[0] * 4


SD15_UNET = SDUNetConfig()


def sd_timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """diffusers ``get_timestep_embedding`` with flip_sin_to_cos=True,
    downscale_freq_shift=0 -> [cos, sin] order, exponent /half."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class SDUNet(nn.Module):
    cfg: SDUNetConfig = SD15_UNET
    dtype: Dtype = jnp.float32
    # Pallas flash attention in the spatial transformers: None = auto
    # (on for TPU backends), True/False forces. Per-model so a parity model
    # and a flash model can coexist in one process.
    flash: "bool | None" = None
    # int8 MXU serving mode for the FLOP-dominant interior (transformer
    # projections + GEGLU + resnet/up/down convs; conv_in/conv_out stay fp,
    # the standard first/last-layer exemption). None = process default.
    int8: "bool | None" = None
    # Fused LN->GEGLU->out-proj Pallas kernel in the transformer blocks
    # (ops/pallas_mlp.py). None = follow the flash knob; its custom
    # partitioning understands both DP rows and Megatron column-sharded
    # GEGLU weights (one psum per MLP, same as the unfused path).
    fused_mlp: "bool | None" = None
    # Rematerialize resnet/transformer blocks in the backward pass — the
    # memory lever for adapter training (backprop through this frozen 860M
    # tower at 512px latents); identical math, forward-only unaffected.
    remat: bool = False

    @nn.compact
    def __call__(self, latents: jax.Array, t: jax.Array, context: jax.Array) -> jax.Array:
        """latents: (B, H, W, 4); t: (B,) int/float; context: (B, S, cross_dim)."""
        c = self.cfg
        RES = nn.remat(ResnetBlock2D) if self.remat else ResnetBlock2D
        TRF = nn.remat(Transformer2D) if self.remat else Transformer2D
        n_blocks = len(c.block_out)
        has_attn = [i < n_blocks - 1 for i in range(n_blocks)]  # SD: last down block plain

        temb = sd_timestep_embedding(t, c.freq_dim).astype(self.dtype)
        temb = nn.Dense(c.temb_dim, dtype=self.dtype, name="time_linear_1")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(c.temb_dim, dtype=self.dtype, name="time_linear_2")(temb)
        context = context.astype(self.dtype)

        x = nn.Conv(c.block_out[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(
            latents.astype(self.dtype)
        )
        skips = [x]

        # ----- down path
        for i, ch in enumerate(c.block_out):
            for j in range(c.layers_per_block):
                x = RES(ch, c.temb_dim, dtype=self.dtype, int8=self.int8, name=f"down_{i}_res_{j}")(x, temb)
                if has_attn[i]:
                    x = TRF(ch, c.heads, dtype=self.dtype, flash=self.flash, int8=self.int8, fused_mlp=self.fused_mlp, name=f"down_{i}_attn_{j}")(x, context)
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(ch, dtype=self.dtype, int8=self.int8, name=f"down_{i}_ds")(x)
                skips.append(x)

        # ----- mid
        ch = c.block_out[-1]
        x = RES(ch, c.temb_dim, dtype=self.dtype, int8=self.int8, name="mid_res_0")(x, temb)
        x = TRF(ch, c.heads, dtype=self.dtype, flash=self.flash, int8=self.int8, fused_mlp=self.fused_mlp, name="mid_attn")(x, context)
        x = RES(ch, c.temb_dim, dtype=self.dtype, int8=self.int8, name="mid_res_1")(x, temb)

        # ----- up path (concat skips, layers_per_block+1 resnets per block)
        for k, i in enumerate(reversed(range(n_blocks))):
            ch = c.block_out[i]
            for j in range(c.layers_per_block + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = RES(ch, c.temb_dim, dtype=self.dtype, int8=self.int8, name=f"up_{k}_res_{j}")(x, temb)
                if has_attn[i]:
                    x = TRF(ch, c.heads, dtype=self.dtype, flash=self.flash, int8=self.int8, fused_mlp=self.fused_mlp, name=f"up_{k}_attn_{j}")(x, context)
            if i > 0:
                x = Upsample2D(ch, dtype=self.dtype, int8=self.int8, name=f"up_{k}_us")(x)

        s = self.param("out_norm_scale", nn.initializers.ones, (c.block_out[0],), jnp.float32)
        b = self.param("out_norm_bias", nn.initializers.zeros, (c.block_out[0],), jnp.float32)
        x = group_norm32(x, s, b)
        x = nn.silu(x)
        return nn.Conv(c.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(x)
