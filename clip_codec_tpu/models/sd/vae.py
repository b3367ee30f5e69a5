"""SD AutoencoderKL (VAE) in Flax, NHWC — the pixel<->latent transform.

Frozen in the reference latent path (``models/sd_decoder.py:39,53-63``).
SD-1.5 config: widths (128, 256, 512, 512), 2 resnets per encoder block,
3 per decoder block, single-head mid attention, 4-ch latents, scaling factor
0.18215 applied by the caller.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import AttnBlockVAE, Downsample2D, ResnetBlock2D, Upsample2D, group_norm32

Dtype = Any


@dataclass(frozen=True)
class VAEConfig:
    block_out: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_ch: int = 4


SD15_VAE = VAEConfig()


class VAEEncoder(nn.Module):
    cfg: VAEConfig = SD15_VAE
    dtype: Dtype = jnp.float32
    flash: "bool | None" = None
    # The VAE stays fp even when the process-wide int8 switch is on: decode
    # quality is the product, and round() would zero the recon/TV/DINO/LPIPS
    # gradients through the decode in the adapter trainer (review r3 #2).
    int8: "bool | None" = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.Conv(c.block_out[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        for i, ch in enumerate(c.block_out):
            for j in range(c.layers_per_block):
                h = ResnetBlock2D(ch, None, dtype=self.dtype, int8=self.int8, name=f"down_{i}_res_{j}")(h)
            if i < len(c.block_out) - 1:
                h = Downsample2D(ch, asymmetric=True, dtype=self.dtype, int8=self.int8, name=f"down_{i}_ds")(h)
        ch = c.block_out[-1]
        h = ResnetBlock2D(ch, None, dtype=self.dtype, int8=self.int8, name="mid_res_0")(h)
        h = AttnBlockVAE(ch, dtype=self.dtype, flash=self.flash, name="mid_attn")(h)
        h = ResnetBlock2D(ch, None, dtype=self.dtype, int8=self.int8, name="mid_res_1")(h)
        s = self.param("out_norm_scale", nn.initializers.ones, (ch,), jnp.float32)
        b = self.param("out_norm_bias", nn.initializers.zeros, (ch,), jnp.float32)
        h = nn.silu(group_norm32(h, s, b, eps=1e-6))
        h = nn.Conv(2 * c.latent_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(h)
        return nn.Conv(2 * c.latent_ch, (1, 1), dtype=self.dtype, name="quant_conv")(h)


class VAEDecoder(nn.Module):
    cfg: VAEConfig = SD15_VAE
    dtype: Dtype = jnp.float32
    flash: "bool | None" = None
    int8: "bool | None" = False  # see VAEEncoder

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.Conv(c.latent_ch, (1, 1), dtype=self.dtype, name="post_quant_conv")(z.astype(self.dtype))
        ch = c.block_out[-1]
        h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(h)
        h = ResnetBlock2D(ch, None, dtype=self.dtype, int8=self.int8, name="mid_res_0")(h)
        h = AttnBlockVAE(ch, dtype=self.dtype, flash=self.flash, name="mid_attn")(h)
        h = ResnetBlock2D(ch, None, dtype=self.dtype, int8=self.int8, name="mid_res_1")(h)
        for k, i in enumerate(reversed(range(len(c.block_out)))):
            ch = c.block_out[i]
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock2D(ch, None, dtype=self.dtype, int8=self.int8, name=f"up_{k}_res_{j}")(h)
            if k < len(c.block_out) - 1:
                h = Upsample2D(ch, dtype=self.dtype, int8=self.int8, name=f"up_{k}_us")(h)
        s = self.param("out_norm_scale", nn.initializers.ones, (ch,), jnp.float32)
        b = self.param("out_norm_bias", nn.initializers.zeros, (ch,), jnp.float32)
        h = nn.silu(group_norm32(h, s, b, eps=1e-6))
        return nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Both halves under one param tree; call with ``method=``."""

    cfg: VAEConfig = SD15_VAE
    dtype: Dtype = jnp.float32
    # Pallas flash attention in the mid-block: None = auto (TPU on).
    flash: "bool | None" = None
    # fp convs regardless of the process int8 switch (see VAEEncoder).
    int8: "bool | None" = False

    def setup(self):
        self.encoder = VAEEncoder(self.cfg, dtype=self.dtype, flash=self.flash, int8=self.int8)
        self.decoder = VAEDecoder(self.cfg, dtype=self.dtype, flash=self.flash, int8=self.int8)

    def encode_moments(self, x: jax.Array) -> jax.Array:
        """(B, H, W, 3) -> (B, H/8, W/8, 2*latent_ch) mean||logvar."""
        return self.encoder(x)

    def sample_latents(self, moments: jax.Array, rng: jax.Array) -> jax.Array:
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(z)

    def __call__(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        return self.decode(self.sample_latents(self.encode_moments(x), rng))
