"""Neural building blocks (layer L4) in Flax linen, NHWC layout.

Behavior-parity counterparts of the reference blocks
(``models/blocks.py:14-83``), re-designed TPU-first:

* **NHWC** everywhere (TPU-native conv layout; the reference is NCHW);
* fp32 parameters with a threaded ``dtype`` for bf16 compute under jit;
* GroupNorm+SiLU goes through :func:`clip_codec_tpu.ops.group_norm_silu`, a
  fusion point with an optional Pallas kernel (XLA fallback elsewhere).

Torch-vs-Flax numerical parity for these blocks is asserted in
``tests/test_model_parity.py`` via converted weights.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.groupnorm import group_norm, group_norm_silu

Dtype = Any


class FiLM(nn.Module):
    """Feature-wise linear modulation: ``x * (1 + scale(h)) + shift(h)``
    per channel (reference ``models/blocks.py:14-25``)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        s = nn.Dense(self.features, dtype=self.dtype, name="to_scale")(h)
        b = nn.Dense(self.features, dtype=self.dtype, name="to_shift")(h)
        # NHWC: broadcast (B, C) over the two spatial dims.
        return x * (1.0 + s[:, None, None, :]) + b[:, None, None, :]


class ResBlock(nn.Module):
    """Channel-preserving residual block with FiLM conditioning
    (reference ``models/blocks.py:28-44``):

        x + conv2(silu(gn2( film( conv1(silu(gn1(x))), h ) )))

    ``fold_spatial``: space-to-batch folding for the huge-spatial/low-batch
    regime where XLA's conv row-tiling collapses (measured 28.8% MFU at
    B=2 @1024 vs 57-65% folded — docs/performance.md 1024px row). "auto"
    folds when :func:`ops.spatial_fold.fold_chunks` says the shape is in the
    win regime (H >= 1024, B <= 4); an int forces that chunk count; 1
    disables. The parameter tree is IDENTICAL either way (same conv kernels,
    only the H padding mode differs), and outputs match to normal bf16
    reassociation noise (tests/test_spatial_fold.py).
    """

    features: int
    groups: int = 8
    dtype: Dtype = jnp.float32
    int8: "bool | None" = None  # None = process default (ops.set_int8_conv)
    fold_spatial: "str | int" = "auto"

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        from ..ops.int8 import conv_module
        from ..ops import spatial_fold as sf

        Conv = conv_module(self.int8)  # nn.Conv, or Int8Conv in int8 serving mode
        g = min(self.groups, self.features)
        chunks = (
            sf.fold_chunks(x.shape) if self.fold_spatial == "auto"
            else int(self.fold_spatial)
        )
        if chunks > 1:
            return self._folded(x, h, Conv, g, chunks)
        y = group_norm_silu(x, self.param_group("norm1", self.features), groups=g)
        y = Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(y)
        y = FiLM(self.features, dtype=self.dtype, name="film")(y, h)
        y = group_norm_silu(y, self.param_group("norm2", self.features), groups=g)
        y = Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(y)
        return x + y

    def _folded(self, x: jax.Array, h: jax.Array, Conv, g: int, chunks: int) -> jax.Array:
        """Space-to-batch body: ONE halo fold (2 rows) feeds both VALID-in-H
        convs (halo 2 -> 1 -> 0); GN stats stay per-image; image-edge halo
        rows are re-zeroed before each conv to reproduce SAME padding on the
        post-norm tensor. Same submodule names/params as the direct path."""
        from ..ops import spatial_fold as sf
        from ..ops.groupnorm import _gn_stats

        B = x.shape[0]
        s1, b1 = self.param_group("norm1", self.features)
        # gn1 stats from the unfolded input (one fp32 reduction, no
        # materialization of a normalized full-res tensor).
        m1, v1 = _gn_stats(x.astype(jnp.float32), g)
        m1 = jnp.repeat(m1.reshape(B, 1, 1, g, 1), chunks, axis=0)
        v1 = jnp.repeat(v1.reshape(B, 1, 1, g, 1), chunks, axis=0)
        xc = sf.fold_halo(x, chunks, halo=2)
        y = sf.normalize_silu(xc, m1, v1, s1, b1, groups=g)
        y = sf.edge_mask(y, B, halo=2)
        y = Conv(self.features, (3, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="conv1")(y)
        y = FiLM(self.features, dtype=self.dtype, name="film")(y, jnp.repeat(h, chunks, axis=0))
        s2, b2 = self.param_group("norm2", self.features)
        m2, v2 = sf.gn_stats_folded(y, B, halo=1, groups=g)
        y = sf.normalize_silu(y, m2, v2, s2, b2, groups=g)
        y = sf.edge_mask(y, B, halo=1)
        y = Conv(self.features, (3, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="conv2")(y)
        return x + sf.unfold(y, B)

    def param_group(self, name: str, c: int):
        """Scale/bias parameters for a fused GroupNorm call."""
        scale = self.param(f"{name}_scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param(f"{name}_bias", nn.initializers.zeros, (c,), jnp.float32)
        return scale, bias


class AttnBlock(nn.Module):
    """Pixels-as-queries attention over a single cond-derived K/V token.

    The reference block (``models/blocks.py:47-68``) is dead code that
    *crashes* on any forward call (its batched matmul mismatches:
    "Expected size ... [8, 4] but got: [8, 1]" — verified against the actual
    reference; its tests only import the class). This implements the
    *intended* semantics: each spatial position's query attends to one
    key/value token derived from the conditioning vector. With a single
    token the softmax is degenerate (=1), so the block reduces to
    ``x + proj(broadcast(v))`` — implemented with the general attention math
    kept in place so multi-token conditioning would work unchanged.
    """

    features: int
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        d = C // self.heads
        q = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="q")(x)
        kv = nn.Dense(2 * self.features, dtype=self.dtype, name="kv")(h)
        k, v = jnp.split(kv, 2, axis=-1)  # each (B, C)
        q = q.reshape(B, H * W, self.heads, d)
        k = k.reshape(B, 1, self.heads, d)
        v = v.reshape(B, 1, self.heads, d)
        # (B, heads, HW, tokens) logits over the (single) token axis.
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, C)
        out = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="proj")(out)
        return x + out


class DWConvBlock(nn.Module):
    """Depthwise-separable conv block: dw3x3 -> pw1x1 -> GN -> GELU
    (reference ``models/blocks.py:71-83``; both convs bias-free)."""

    cin: int
    cout: int
    max_groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(
            self.cin, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=self.cin,
            use_bias=False, dtype=self.dtype, name="dw",
        )(x)
        y = nn.Conv(self.cout, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(y)
        g = math.gcd(self.cout, self.max_groups) or 1
        scale = self.param("gn_scale", nn.initializers.ones, (self.cout,), jnp.float32)
        bias = self.param("gn_bias", nn.initializers.zeros, (self.cout,), jnp.float32)
        y = group_norm(y, (scale, bias), groups=g)
        return nn.gelu(y, approximate=False)
