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
    per channel (reference ``models/blocks.py:14-25``). ``setup``-style so
    :meth:`coeffs` can expose the per-(batch, channel) pair for fusion into
    a Pallas-kernel affine (same param tree as the previous compact form)."""

    features: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.to_scale = nn.Dense(self.features, dtype=self.dtype)
        self.to_shift = nn.Dense(self.features, dtype=self.dtype)

    def coeffs(self, h: jax.Array) -> tuple:
        """(scale, shift), each (B, C): x' = x * (1 + scale) + shift."""
        return self.to_scale(h), self.to_shift(h)

    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        s, b = self.coeffs(h)
        # NHWC: broadcast (B, C) over the two spatial dims.
        return x * (1.0 + s[:, None, None, :]) + b[:, None, None, :]


class _ConvParams(nn.Module):
    """Declares exactly ``nn.Conv(features, (3, 3))``'s parameters (same
    names, shapes, inits) without running the op — lets the fused Pallas
    block own the conv while checkpoints stay interchangeable."""

    features: int
    cin: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.cin, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


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

    ``fused_pallas``: the whole block as TWO fused Pallas kernel passes
    (``ops/pallas_resblock.py``: GN1 and GN2∘FiLM fold into per-(batch,
    channel) affines; GN2 statistics derive from kernel-1's fp32 moments so
    the FiLM'd intermediate never materializes). "auto" defers to
    ``fused_block_gate`` — which is currently OFF everywhere: the kernel
    measures at PARITY with the fold/XLA paths in the current environment
    (r5 re-probes, docs/performance.md "1024px re-measured"); True forces
    (tests via interpret mode; on-chip A/B); False disables (training: the
    kernel's custom_vjp backward re-runs the XLA reference). Same param
    tree as the other paths.
    """

    features: int
    groups: int = 8
    dtype: Dtype = jnp.float32
    int8: "bool | None" = None  # None = process default (ops.set_int8_conv)
    fold_spatial: "str | int" = "auto"
    fused_pallas: "str | bool" = "auto"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        h: jax.Array,
        folded_batch: Optional[int] = None,
        halo: Optional[int] = None,
    ) -> jax.Array:
        """``folded_batch``/``halo``: pre-folded calling convention — ``x`` is
        an already space-to-batch-folded tensor (``fold_halo`` layout, image
        batch ``folded_batch``, ``halo`` rows each side) and the result keeps
        the folded layout with ``halo - 2`` rows. Lets the UNet chain both
        same-resolution ResBlocks of a stage through ONE fold (halo 4 -> 2
        -> 0) instead of folding per block."""
        from ..ops.int8 import conv_module
        from ..ops import spatial_fold as sf

        Conv = conv_module(self.int8)  # nn.Conv, or Int8Conv in int8 serving mode
        g = min(self.groups, self.features)
        if folded_batch is not None:
            return self._folded_core(x, h, Conv, g, folded_batch, halo)
        if Conv is nn.Conv and x.shape[-1] == self.features:
            from ..ops.pallas_resblock import fused_block_gate

            if self.fused_pallas is True or (
                self.fused_pallas == "auto"
                and fused_block_gate(x.shape, jnp.dtype(self.dtype).itemsize)
            ):
                return self._pallas_core(x, h, g)
        chunks = (
            sf.fold_chunks(x.shape) if self.fold_spatial == "auto"
            else int(self.fold_spatial)
        )
        if chunks > 1:
            # ONE halo fold (2 rows) feeds both VALID-in-H convs
            # (halo 2 -> 1 -> 0); the fold copy is amortized over the block.
            xc = sf.fold_halo(x, chunks, halo=2)
            return sf.unfold(self._folded_core(xc, h, Conv, g, x.shape[0], 2), x.shape[0])
        y = group_norm_silu(x, self.param_group("norm1", self.features), groups=g)
        y = Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(y)
        y = FiLM(self.features, dtype=self.dtype, name="film")(y, h)
        y = group_norm_silu(y, self.param_group("norm2", self.features), groups=g)
        y = Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(y)
        return x + y

    def _folded_core(
        self, xc: jax.Array, h: jax.Array, Conv, g: int, batch: int, halo: int
    ) -> jax.Array:
        """Folded-layout body: input carries ``halo`` rows per side, output
        ``halo - 2`` (each VALID-in-H conv consumes one). GN stats stay
        per-image (masked valid-row statistics); image-edge halo rows are
        re-zeroed before each conv to reproduce SAME padding on the
        post-norm tensor. Same submodule names/params as the direct path."""
        from ..ops import spatial_fold as sf

        chunks = xc.shape[0] // batch
        s1, b1 = self.param_group("norm1", self.features)
        m1, v1 = sf.gn_stats_folded(xc, batch, halo=halo, groups=g)
        y = sf.normalize_silu(xc, m1, v1, s1, b1, groups=g)
        y = sf.edge_mask(y, batch, halo=halo)
        y = Conv(self.features, (3, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="conv1")(y)
        y = FiLM(self.features, dtype=self.dtype, name="film")(y, jnp.repeat(h, chunks, axis=0))
        s2, b2 = self.param_group("norm2", self.features)
        m2, v2 = sf.gn_stats_folded(y, batch, halo=halo - 1, groups=g)
        y = sf.normalize_silu(y, m2, v2, s2, b2, groups=g)
        y = sf.edge_mask(y, batch, halo=halo - 1)
        y = Conv(self.features, (3, 3), padding=((0, 0), (1, 1)), dtype=self.dtype, name="conv2")(y)
        return xc[:, 2:-2] + y

    def _pallas_core(self, x: jax.Array, h: jax.Array, g: int) -> jax.Array:
        """Whole block as two fused affine+SiLU+conv3x3 Pallas passes.
        Identical parameter tree to the direct/folded paths (`_ConvParams`
        declares nn.Conv's params; FiLM/param_group are the same modules)."""
        from ..ops import pallas_resblock as pr

        C = self.features
        s1, b1 = self.param_group("norm1", C)
        s2, b2 = self.param_group("norm2", C)
        k1, cb1 = _ConvParams(C, x.shape[-1], name="conv1")()
        k2, cb2 = _ConvParams(C, C, name="conv2")()
        fs, fb = FiLM(C, dtype=self.dtype, name="film").coeffs(h)

        xd = x.astype(self.dtype)
        A1, B1 = pr.gn_affine(x, s1, b1, g)
        y, mom = pr.affine_silu_conv3x3(
            xd, A1, B1, k1.astype(self.dtype).reshape(9, x.shape[-1], C),
            cb1, want_moments=True,
        )
        A2, B2 = pr.gn_affine_from_moments(
            mom, x.shape[1] * x.shape[2], s2, b2, g,
            film=(fs.astype(jnp.float32), fb.astype(jnp.float32)),
        )
        out, _ = pr.affine_silu_conv3x3(
            y, A2, B2, k2.astype(self.dtype).reshape(9, C, C), cb2, add=xd,
        )
        return out

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
