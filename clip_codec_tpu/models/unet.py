"""CLIP-conditioned U-Net (layer L4) in Flax linen, NHWC, bf16-ready.

Topology-parity rebuild of the reference ``CLIPCondUNet``
(``models/unet.py:42-106``):

* conditioning: sinusoidal timestep embedding (cos||sin order, odd-dim zero
  pad, ``unet.py:22-39``) -> MLP, plus Linear+SiLU projection of the CLIP
  vector; the two are summed into one FiLM conditioning vector ``h``;
* encoder: per ``ch_mult`` stage, 2 ResBlocks then a stride-2 3x3 conv that
  also multiplies channels (``unet.py:61-64``); the skip is captured *before*
  the downsample (``unet.py:93``);
* middle: 2 ResBlocks; decoder: per stage 2 ResBlocks then a 4x4/stride-2
  transposed conv halving channels, with **additive** (not concat) skips
  applied after each up-stage (``unet.py:99-104``);
* head: GroupNorm(8) then 3x3 conv, **no activation** (``unet.py:78-79,105``);
* no attention anywhere (``models/unet.py`` has none), fully convolutional —
  sampling resolution is a free parameter.

TPU-first differences: NHWC layout, fp32 params with a ``dtype`` knob for
bf16 activations, fused GroupNorm+SiLU fusion points, and
``jax.checkpoint``-friendly pure-functional structure. Weight conversion from
the reference's torch state_dicts lives in ``clip_codec_tpu/weights/convert.py``
and exact-parity is asserted in ``tests/test_model_parity.py``.

Default config (base=128, ch_mult=(1,2,2)) matches the reference's hard-coded
training/inference config (``train/diffusion_train.py:103``).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import FiLM, ResBlock

Dtype = Any


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embedding, fp32, cos||sin order with odd-dim pad
    (reference ``models/unet.py:22-39``)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ConvTranspose4x2(nn.Module):
    """``ConvTranspose2d(k=4, s=2, p=1)`` with the flax parameter layout
    (kernel (4, 4, out, in) + bias), computed either by flax's transposed
    conv or — ``phase_decomposed=True`` — as four dense 2x2 phase convs +
    interleave (ops/conv_transpose.py). Identical parameters and math, so
    checkpoints/converters are unaffected by the flag."""

    features: int
    dtype: Dtype = jnp.float32
    phase_decomposed: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        # default lecun_normal() on the (4, 4, out, in) shape == what flax's
        # ConvTranspose(transpose_kernel=True) does — fresh-init values stay
        # bit-identical across the flag (same param rng path + fan rule).
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (4, 4, self.features, cin),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        xc = x.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        if self.phase_decomposed:
            from ..ops.conv_transpose import conv_transpose_k4s2

            y = conv_transpose_k4s2(xc, kc, None)
        else:
            # Folded where its gate covers, else XLA's direct transposed
            # conv. The r5 probe (scripts/probe_upsampler.py) measured
            # IN-SCAN wins for the phase/one-GEMM forms at Cin>=256 shapes
            # (up to 2.3x), but wiring that dispatch LOST the e2e headline
            # (12.393 -> 12.199 img/s): in the real program the consumer is
            # a skip-concat -> 3x3 conv and XLA's layout choice flips the
            # verdict (same probe-consumer trap as docs "1024px re-measured"
            # item 4). Both forms stay forced-able (phase_decomposed=True /
            # ops.conv_transpose_k4s2_onegemm) and exactness-tested.
            from ..ops.spatial_fold import folded_conv_transpose_k4s2

            y = folded_conv_transpose_k4s2(xc, kc)
            if y is None:
                y = jax.lax.conv_transpose(
                    xc, kc, strides=(2, 2), padding=((2, 2), (2, 2)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    transpose_kernel=True,
                )
        return y + bias.astype(y.dtype)


class CLIPCondUNet(nn.Module):
    """FiLM-conditioned fully-convolutional U-Net predicting eps(x_t, z, t)."""

    z_dim: int = 512
    base: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2)
    time_dim: int = 256
    img_ch: int = 3
    dtype: Dtype = jnp.float32
    # int8 MXU serving convolutions: None = process default
    # (ops.set_int8_conv), True/False pins this model — so an int8 server
    # and a bf16 parity model can coexist in one process.
    int8: "bool | None" = None
    # Rematerialize each ResBlock in the backward pass (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for dropping the block's activation
    # chain from HBM — the memory lever for 512px+ training batches.
    # Identical math/params; forward-only use is unaffected.
    remat: bool = False
    # Fused-Pallas ResBlocks ("auto" = measured-win shapes, see
    # ResBlock.fused_pallas). Forced False under remat/training.
    fused_pallas: "str | bool" = "auto"
    # Upsamplers as phase-decomposed dense convs (identical math/params).
    # Measured TWICE e2e (r2: 9.2 vs 11.5 img/s; r5 with a per-shape
    # phase/one-GEMM auto-gate: 12.199 vs 12.393): the decomposed forms win
    # IN-SCAN at Cin>=256 shapes (scripts/probe_upsampler.py, up to 2.3x)
    # but lose in the full program, where the skip-concat -> conv consumer
    # drives XLA to a different layout. Default stays False (direct/folded);
    # kept as an A/B-able op with exactness tests.
    phase_decomposed_up: bool = False

    @nn.compact
    def __call__(self, x_t: jax.Array, z: jax.Array, t: jax.Array) -> jax.Array:
        """x_t: (B, H, W, C) NHWC; z: (B, z_dim); t: (B,) int -> eps (B, H, W, C)."""
        # Conditioning vector h = MLP(t_emb) + SiLU(Linear(z)).
        temb = timestep_embedding(t, self.time_dim).astype(self.dtype)
        temb = nn.Dense(self.time_dim * 4, dtype=self.dtype, name="time_proj_0")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(self.time_dim, dtype=self.dtype, name="time_proj_2")(temb)
        zemb = nn.Dense(self.time_dim, dtype=self.dtype, name="z_proj_0")(z.astype(self.dtype))
        zemb = nn.silu(zemb)
        h = temb + zemb

        from ..ops.pallas_resblock import affine_conv3x3, fused_boundary_gate

        itemsize = jnp.dtype(self.dtype).itemsize
        # The 3->base IN conv cannot take the fused-Pallas form: Mosaic
        # rejects HBM memref slices whose lane (minor) dim is not aligned to
        # the 128 tile, and the image input has img_ch=3 lanes (measured on
        # chip, scripts/probe_boundary_conv.py r5: "Slice shape along
        # dimension 3 must be aligned to tiling (128), but is 3"). At the
        # huge-spatial shapes it becomes an im2col GEMM instead (1.2 vs
        # 2.2 ms standalone at 1024px B=2, ops/im2col.py); everywhere else
        # the direct conv is kept.
        from ..ops.im2col import conv3x3_im2col, im2col_gate

        if self.fused_pallas is not False and im2col_gate(x_t.shape):
            from .blocks import _ConvParams

            ki, bi = _ConvParams(self.base, self.img_ch, name="in_conv")()
            x = conv3x3_im2col(x_t.astype(self.dtype), ki.astype(self.dtype), bi)
        else:
            x = nn.Conv(self.base, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="in_conv")(
                x_t.astype(self.dtype)
            )

        from ..ops.int8 import conv_module

        Conv = conv_module(self.int8)  # nn.Conv, or Int8Conv in int8 serving mode
        RB = nn.remat(ResBlock) if self.remat else ResBlock

        from ..ops import spatial_fold as sf

        # Fused-Pallas blocks are inference-path only: their custom_vjp
        # backward re-runs the XLA reference, so under remat/training the
        # fold path stays the fastest end-to-end form.
        fused_pallas = False if self.remat else self.fused_pallas

        def rb_pair(x, ch, name0, name1):
            """The two same-resolution ResBlocks of a stage. In the
            spatial-fold regime they chain through ONE fold (halo 4 -> 2 ->
            0), saving a fold/unfold round-trip per stage; remat keeps the
            per-block form (jax.checkpoint wraps plain __call__). When the
            fused-Pallas gate covers the shape (r5: default none — the
            kernel measures at parity with the fold path, docs/performance
            "1024px re-measured"), the blocks are called plain (each
            becomes two fused kernel passes)."""
            from ..ops.pallas_resblock import fused_block_gate

            pallas = Conv is nn.Conv and x.shape[-1] == ch and (
                fused_pallas is True
                or (fused_pallas == "auto"
                    and fused_block_gate(x.shape, jnp.dtype(self.dtype).itemsize))
            )
            chunks = sf.fold_chunks(x.shape) if not (self.remat or pallas) else 1
            if chunks > 1:
                B = x.shape[0]
                xc = sf.fold_halo(x, chunks, halo=4)
                xc = RB(ch, dtype=self.dtype, int8=self.int8, name=name0)(
                    xc, h, folded_batch=B, halo=4)
                xc = RB(ch, dtype=self.dtype, int8=self.int8, name=name1)(
                    xc, h, folded_batch=B, halo=2)
                return sf.unfold(xc, B)
            x = RB(ch, dtype=self.dtype, int8=self.int8,
                   fused_pallas=fused_pallas, name=name0)(x, h)
            return RB(ch, dtype=self.dtype, int8=self.int8,
                      fused_pallas=fused_pallas, name=name1)(x, h)

        # Encoder: skip captured after the 2 ResBlocks, before downsample.
        skips = []
        ch = self.base
        for i, m in enumerate(self.ch_mult):
            x = rb_pair(x, ch, f"down_{i}_rb0", f"down_{i}_rb1")
            skips.append(x)
            x = Conv(
                ch * m, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name=f"down_{i}_ds",
            )(x)
            ch = ch * m

        x = RB(ch, dtype=self.dtype, int8=self.int8,
               fused_pallas=fused_pallas, name="mid1")(x, h)
        x = RB(ch, dtype=self.dtype, int8=self.int8,
               fused_pallas=fused_pallas, name="mid2")(x, h)

        # Decoder with additive skips after each up-stage.
        for j, m in enumerate(reversed(self.ch_mult)):
            x = rb_pair(x, ch, f"up_{j}_rb0", f"up_{j}_rb1")
            # padding (2,2) + transpose_kernel=True == torch ConvTranspose2d
            # (k=4, s=2, p=1): exact 2x upsample, numerically verified.
            x = ConvTranspose4x2(
                ch // m, dtype=self.dtype, phase_decomposed=self.phase_decomposed_up,
                name=f"up_{j}_us",
            )(x)
            ch = ch // m
            x = x + skips.pop()

        from ..ops.groupnorm import group_norm

        scale = self.param("out_norm_scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("out_norm_bias", nn.initializers.zeros, (ch,), jnp.float32)
        if self.fused_pallas is not False and not self.remat and (
            self.fused_pallas is True
            or fused_boundary_gate(x.shape, self.img_ch, itemsize)
        ):
            # GN + head conv as ONE Pallas pass: GroupNorm folds into the
            # kernel's per-(batch, channel) affine (only the stats reduction
            # stays XLA) — reference unet.py:78-79,105: GN -> conv, no
            # activation. Gate default-off in r5 (parity with the folded
            # head in the whole-net A/B); reachable via fused_pallas=True.
            from ..ops.pallas_resblock import gn_affine
            from .blocks import _ConvParams

            ko, bo = _ConvParams(self.img_ch, ch, name="out")()
            A, Bv = gn_affine(x, scale, bias, 8)
            y, _ = affine_conv3x3(
                x.astype(self.dtype), A, Bv,
                ko.astype(self.dtype).reshape(9, ch, self.img_ch), bo,
            )
            return y
        x = group_norm(x, (scale, bias), groups=8)
        # The 128->3 head conv hits the same small-batch tiling pathology as
        # the ResBlocks (13.3 -> 9.8 ms folded at B=2 @1024, docs 1024px
        # section); fold in the measured-win regime. NOTE the input here is
        # post-GroupNorm, but the head conv's SAME padding pads THIS tensor,
        # so fold_halo's zero edges are exactly right (in_conv folding was
        # measured a loss, 7.9 -> 9.5 ms, and stays direct — superseded by
        # the fused boundary path above in its gate regime).
        from ..ops import spatial_fold as sf

        chunks = sf.fold_chunks(x.shape)
        out_conv = nn.Conv(
            self.img_ch, (3, 3),
            padding=(((0, 0) if chunks > 1 else (1, 1)), (1, 1)),
            dtype=self.dtype, name="out",
        )
        if chunks > 1:
            return sf.unfold(out_conv(sf.fold_halo(x, chunks, halo=1)), x.shape[0])
        return out_conv(x)
