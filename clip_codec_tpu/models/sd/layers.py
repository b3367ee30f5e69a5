"""Stable-Diffusion building blocks (NHWC Flax): resnets, spatial
transformers, up/down-sampling — the pieces of SD-1.5's UNet and VAE.

The reference consumes these architectures through ``diffusers``
(``models/sd_decoder.py:7``); here they are native so the whole latent path
is one XLA program. Structure follows the SD-1.5 model spec (diffusers
``ResnetBlock2D`` / ``Transformer2DModel`` / ``AutoencoderKL`` layouts) so
that released checkpoints convert 1:1 (:mod:`clip_codec_tpu.weights.convert_sd`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def group_norm32(x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int = 32, eps: float = 1e-5) -> jax.Array:
    import math

    from ...ops.groupnorm import group_norm

    # Sized-down test configs need a divisor of C; real SD widths (all
    # multiples of 32) keep 32 groups. gcd gives the largest valid clamp.
    g = math.gcd(groups, int(x.shape[-1])) or 1
    return group_norm(x, (scale, bias), groups=g, eps=eps)


class ResnetBlock2D(nn.Module):
    """GN32 -> SiLU -> conv -> (+temb proj) -> GN32 -> SiLU -> conv, with a
    1x1 shortcut when channels change (SD resnet layout)."""

    out_ch: int
    temb_dim: Optional[int] = None
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    int8: Optional[bool] = None  # int8 MXU serving convs (None = process default)

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        import math

        from ...ops import spatial_fold as sf
        from ...ops.int8 import conv_module

        Conv = conv_module(self.int8)
        cin = x.shape[-1]
        s1 = self.param("norm1_scale", nn.initializers.ones, (cin,), jnp.float32)
        b1 = self.param("norm1_bias", nn.initializers.zeros, (cin,), jnp.float32)
        s2 = self.param("norm2_scale", nn.initializers.ones, (self.out_ch,), jnp.float32)
        b2 = self.param("norm2_bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        chunks = sf.fold_chunks(x.shape)
        if chunks > 1:
            # Space-to-batch fold (docs/performance.md "spatial-fold attack"):
            # in the VAE decode this hits the 512px/256px up-stage resnets at
            # batch 2-4 — same pathology, same fix as the pixel ResBlock.
            B = x.shape[0]
            g1 = math.gcd(32, cin) or 1
            g2 = math.gcd(32, self.out_ch) or 1
            xc = sf.fold_halo(x, chunks, halo=2)
            m1, v1 = sf.gn_stats_folded(xc, B, halo=2, groups=g1)
            h = sf.normalize_silu(xc, m1, v1, s1, b1, groups=g1, eps=self.eps)
            h = sf.edge_mask(h, B, halo=2)
            h = Conv(self.out_ch, (3, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="conv1")(h)
            if temb is not None and self.temb_dim is not None:
                t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
                h = h + jnp.repeat(t, chunks, axis=0)[:, None, None, :]
            m2, v2 = sf.gn_stats_folded(h, B, halo=1, groups=g2)
            h = sf.normalize_silu(h, m2, v2, s2, b2, groups=g2, eps=self.eps)
            h = sf.edge_mask(h, B, halo=1)
            h = Conv(self.out_ch, (3, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="conv2")(h)
            skip = xc[:, 2:-2]
            if cin != self.out_ch:
                skip = Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(skip)
            return sf.unfold(skip + h, B)
        h = group_norm32(x, s1, b1, eps=self.eps)
        h = nn.silu(h)
        h = Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(h)
        if temb is not None and self.temb_dim is not None:
            t = nn.Dense(self.out_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = group_norm32(h, s2, b2, eps=self.eps)
        h = nn.silu(h)
        h = Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(h)
        if cin != self.out_ch:
            x = Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    """Multi-head attention; context=None -> self-attention (SD ``Attention``
    layout: to_q/to_k/to_v without bias, to_out with bias).

    ``flash``: None = auto (Pallas flash kernel on TPU backends), True/False
    forces — a per-model knob so e.g. a parity model and a flash model can
    coexist in one process (threaded down from :class:`SDUNet` /
    :class:`~clip_codec_tpu.models.sd.vae.AutoencoderKL`)."""

    dim: int
    heads: int
    dtype: Dtype = jnp.float32
    flash: Optional[bool] = None
    int8: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        from ...ops.int8 import dense_module

        Dense = dense_module(self.int8)
        ctx = x if context is None else context
        B, N, _ = x.shape
        M = ctx.shape[1]
        h = self.heads
        d = self.dim // h
        q = Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        from ...ops.groupnorm import flash_enabled

        use_flash = flash_enabled() if self.flash is None else self.flash
        if context is None and use_flash and N >= 1024 and N % 128 == 0:
            # Self-attention over thousands of latent pixels: the Pallas flash
            # kernel avoids materializing the (h, N, N) attention matrix
            # (~0.5 GB/image at SD 512px). Cross-attention sees <=77 context
            # tokens - not worth a kernel. The head-batched (B, h, N, d) form
            # composes with Megatron head sharding (parallel/tp.py): each
            # device runs its local heads, no resharding collectives.
            from ...ops.pallas_attention import flash_attention_heads

            qf = q.reshape(B, N, h, d).transpose(0, 2, 1, 3)
            kf = k.reshape(B, M, h, d).transpose(0, 2, 1, 3)
            vf = v.reshape(B, M, h, d).transpose(0, 2, 1, 3)
            out = flash_attention_heads(qf, kf, vf)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        else:
            q = q.reshape(B, N, h, d)
            k = k.reshape(B, M, h, d)
            v = v.reshape(B, M, h, d)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, self.dim)
        return Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    """``hidden * gelu(gate)`` with the two projections as SEPARATE Dense
    params (``proj_h``/``proj_g``) rather than diffusers' fused ``proj``:
    identical math (the fused kernel's column halves, split by the weight
    converter), but each projection can be column-sharded independently
    under tensor parallelism — a contiguous ``jnp.split`` of one fused
    sharded axis would put each gate half wholly on one device and force a
    reshard of the 4x-width MLP hidden every block."""

    dim_out: int
    dtype: Dtype = jnp.float32
    int8: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ...ops.int8 import dense_module

        Dense = dense_module(self.int8)
        a = Dense(self.dim_out, dtype=self.dtype, name="proj_h")(x)
        g = Dense(self.dim_out, dtype=self.dtype, name="proj_g")(x)
        return a * nn.gelu(g, approximate=False)


class _LNParams(nn.Module):
    """Declares ``nn.LayerNorm``'s exact param tree (scale ones, bias zeros)
    without running the op — lets a fused kernel own the compute while any
    checkpoint keeps loading unchanged."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _DenseParams(nn.Module):
    """Declares ``nn.Dense``'s exact param tree (lecun_normal kernel first,
    zeros bias second — same creation order, so the same rng stream yields
    the same fresh-init values)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class _GEGLUParams(nn.Module):
    """Param tree of :class:`GEGLU` (``proj_h``/``proj_g``) without compute."""

    dim_out: int
    in_features: int

    @nn.compact
    def __call__(self):
        wh, bh = _DenseParams(self.dim_out, self.in_features, name="proj_h")()
        wg, bg = _DenseParams(self.dim_out, self.in_features, name="proj_g")()
        return wh, bh, wg, bg


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn(context) -> LN -> GEGLU MLP.

    The MLP tail (``norm3 -> ff_geglu -> ff_out -> residual``) runs as ONE
    fused Pallas kernel on TPU when the flash knob is on and the block is
    not in int8 mode (:mod:`clip_codec_tpu.ops.pallas_mlp`): under XLA the
    4x-width GEGLU hidden is materialized to HBM twice per block. The param
    tree is IDENTICAL either way (declared by the ``_*Params`` holders), so
    checkpoints and the TP sharding rules are oblivious to the switch."""

    dim: int
    heads: int
    dtype: Dtype = jnp.float32
    flash: Optional[bool] = None
    int8: Optional[bool] = None
    fused_mlp: Optional[bool] = None  # None = follow the flash knob

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        from ...ops.groupnorm import flash_enabled
        from ...ops.int8 import dense_module

        kw = dict(dtype=self.dtype, flash=self.flash, int8=self.int8)
        x = x + CrossAttention(self.dim, self.heads, name="attn1", **kw)(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        )
        x = x + CrossAttention(self.dim, self.heads, name="attn2", **kw)(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context
        )
        Dense = dense_module(self.int8)
        use_fused = self.fused_mlp
        if use_fused and Dense is not nn.Dense:
            # Mirrors the auto gate's `Dense is nn.Dense` check: a forced
            # fused MLP would silently bypass Int8Dense — the MLP would run
            # unquantized and the 'quant' collection would lose its entries,
            # diverging from int8 checkpoints/calibration with no error.
            raise ValueError(
                "fused_mlp=True is incompatible with int8 mode: the fused "
                "Pallas MLP has no int8 path, so forcing it would skip "
                "quantization for ff_geglu/ff_out. Use fused_mlp=None (auto) "
                "or disable int8."
            )
        if use_fused is None:
            from ...ops.groupnorm import fused_mlp_enabled

            use_fused = (
                fused_mlp_enabled()
                and (flash_enabled() if self.flash is None else self.flash)
                and Dense is nn.Dense
            )
        if use_fused:
            from ...ops.pallas_mlp import transformer_mlp

            lns, lnb = _LNParams(self.dim, name="norm3")()
            wh, bh, wg, bg = _GEGLUParams(self.dim * 4, self.dim, name="ff_geglu")()
            wo, bo = _DenseParams(self.dim, self.dim * 4, name="ff_out")()
            y = transformer_mlp(x.astype(self.dtype), lns, lnb, wh, bh, wg, bg, wo)
            return x + y + bo.astype(self.dtype)
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        y = GEGLU(self.dim * 4, dtype=self.dtype, int8=self.int8, name="ff_geglu")(y)
        y = Dense(self.dim, dtype=self.dtype, name="ff_out")(y)
        return x + y


class Transformer2D(nn.Module):
    """Spatial transformer: GN(eps 1e-6) -> 1x1 conv in -> transformer blocks
    over flattened pixels -> 1x1 conv out, residual (SD-1.5 uses conv
    projections, ``use_linear_projection=False``)."""

    dim: int
    heads: int
    depth: int = 1
    dtype: Dtype = jnp.float32
    flash: Optional[bool] = None
    int8: Optional[bool] = None
    fused_mlp: Optional[bool] = None  # None = follow the flash knob

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        from ...ops.int8 import conv_module

        Conv = conv_module(self.int8)
        B, H, W, C = x.shape
        s = self.param("norm_scale", nn.initializers.ones, (C,), jnp.float32)
        b = self.param("norm_bias", nn.initializers.zeros, (C,), jnp.float32)
        h = group_norm32(x, s, b, eps=1e-6)
        h = Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, self.dim)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.dim, self.heads, dtype=self.dtype, flash=self.flash,
                int8=self.int8, fused_mlp=self.fused_mlp, name=f"block_{i}",
            )(h, context)
        h = h.reshape(B, H, W, self.dim)
        h = Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv; ``asymmetric=True`` uses the VAE-encoder (0,1) pad."""

    out_ch: int
    asymmetric: bool = False
    dtype: Dtype = jnp.float32
    int8: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ...ops.int8 import conv_module

        pad = ((0, 1), (0, 1)) if self.asymmetric else ((1, 1), (1, 1))
        return conv_module(self.int8)(
            self.out_ch, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype, name="conv"
        )(x)


class _ConvParams(nn.Module):
    """Declares ``nn.Conv``'s exact param tree (HWIO lecun_normal kernel,
    zeros bias) without running the op."""

    features: int
    in_features: int
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class Upsample2D(nn.Module):
    """Nearest 2x then 3x3 conv (SD upsampler).

    On TPU at wide-channel SMALL-spatial inputs (the UNet's up path) the
    composite runs PHASE-DECOMPOSED (``ops/upsample.py``: four 2x2 convs on
    the original tensor — 4/9 the FLOPs, the 4x tensor never exists).
    Measured on v5e: STANDALONE the op wins at every C>=512 shape (0.52 ->
    0.30 ms at 64->128/C512 B=1; 3.67 -> 2.73 at B=8), and in the UNet it
    holds (whole forward 62.5 -> 61.1 ms at B=8) — but inside the VAE
    decoder at 64->128/128->256 it REGRESSES end-to-end (21.6 -> 23.1 ms):
    at large spatial the phase interleave breaks XLA's fusion with the
    surrounding resnets. Auto gate: TPU, fp conv, C >= 512, H <= 32.
    Same param tree either way; fp32 parity is exact, bf16 differs only by
    one weight-sum rounding (tests/test_upsample.py)."""

    out_ch: int
    dtype: Dtype = jnp.float32
    int8: Optional[bool] = None
    fused: Optional[bool] = None  # None = auto (TPU, fp conv, C>=512, H<=32)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ...ops.int8 import conv_module

        B, H, W, C = x.shape
        Conv = conv_module(self.int8)
        use_fused = self.fused
        if use_fused and Conv is not nn.Conv:
            # Same hazard as BasicTransformerBlock.fused_mlp: forcing the
            # fused upsample in int8 mode would silently skip Int8Conv.
            raise ValueError(
                "Upsample2D(fused=True) is incompatible with int8 mode: the "
                "fused nearest-up+conv path has no int8 variant. Use "
                "fused=None (auto) or disable int8."
            )
        if use_fused is None:
            import jax as _jax

            try:
                on_tpu = _jax.default_backend() == "tpu"
            except RuntimeError:
                on_tpu = False
            use_fused = on_tpu and Conv is nn.Conv and C >= 512 and H <= 32
        if use_fused:
            from ...ops.upsample import nearest_up_conv

            k, b = _ConvParams(self.out_ch, C, name="conv")()
            return nearest_up_conv(
                x.astype(self.dtype), k.astype(self.dtype), b
            )
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return Conv(
            self.out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )(x)


class AttnBlockVAE(nn.Module):
    """Single-head self-attention over pixels (VAE mid-block attention)."""

    ch: int
    dtype: Dtype = jnp.float32
    flash: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        s = self.param("norm_scale", nn.initializers.ones, (C,), jnp.float32)
        b = self.param("norm_bias", nn.initializers.zeros, (C,), jnp.float32)
        h = group_norm32(x, s, b, eps=1e-6).reshape(B, H * W, C)
        q = nn.Dense(self.ch, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(self.ch, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(self.ch, dtype=self.dtype, name="to_v")(h)
        N = H * W
        from ...ops.groupnorm import flash_enabled

        use_flash = flash_enabled() if self.flash is None else self.flash
        if use_flash and N >= 1024 and N % 128 == 0:
            # 512px VAE encode/decode attends over 4096 pixels in ONE head:
            # the materialized (N, N) matrix is the largest tensor in the
            # whole VAE - flash attention keeps it out of HBM. The
            # head-batched wrapper (H=1) dispatches by backend, so a forced
            # flash=True stays runnable off-TPU.
            from ...ops.pallas_attention import flash_attention_heads

            out = flash_attention_heads(
                q[:, None], k[:, None], v[:, None]
            )[:, 0]
        else:
            logits = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(self.ch).astype(q.dtype)
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bqk,bkd->bqd", attn, v)
        out = nn.Dense(self.ch, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)
