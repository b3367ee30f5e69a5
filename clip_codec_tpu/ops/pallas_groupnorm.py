"""Pallas TPU kernel: fused GroupNorm + SiLU over NHWC activations.

The hot normalization of every U-Net ResBlock (reference equivalent:
``nn.GroupNorm`` + ``nn.SiLU``, ``models/blocks.py:33-44``). One kernel does
both passes VMEM-resident per H-tile:

* pass 1 reduces per-channel sum/sumsq over H tiles into a (B, 2, C) stats
  array (VMEM-scratch accumulation, the legal consecutive-revisit pattern);
  pass 2 turns channel stats into group stats with a one-hot matmul (Mosaic
  cannot lay out (HW, g, C/g) reshapes), broadcasts them back, and writes
  ``silu(gn(x))``;
* statistics accumulate in fp32 regardless of input dtype (bf16-safe), same
  as the jnp fallback in :mod:`clip_codec_tpu.ops.groupnorm`;
* backward is a custom VJP that re-derives gradients from the jnp
  implementation — forward speed where it counts, exact training gradients.

Enable process-wide with ``clip_codec_tpu.ops.enable_pallas()``; benchmarked
against the XLA-fused path by ``bench_ops.py`` (kept switchable because XLA
already fuses GN+SiLU into adjacent convs well).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int, w: int, c: int, budget_bytes: int = 2 * 1024 * 1024) -> int:
    """Largest divisor-of-H tile whose fp32 block fits the VMEM budget
    (several live copies of the block exist: input, f32 temp, output,
    pipeline double-buffers — budget keeps total well under ~16 MB)."""
    for t in (64, 32, 16, 8, 4, 2, 1):
        if h % t == 0 and t * w * c * 4 <= budget_bytes:
            return t
    return 1


def _group_onehot(C: int, groups: int) -> jax.Array:
    """(C, groups) one-hot: M[c, k] = 1 if channel c belongs to group k.
    Group aggregation becomes two tiny matmuls — no reshapes, which Mosaic's
    vector layouts cannot always express for (HW, g, C/g) splits."""
    cg = C // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    return (ch // cg == gr).astype(jnp.float32)


def _stats_kernel(x_ref, stats_ref, acc_ref):
    """Pass 1: per-(sample, channel) sum/sumsq reduced over H tiles. The stats
    output block maps to the same (b,) slot for every h-iteration —
    consecutive revisits, the legal Pallas reduction pattern."""
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0].astype(jnp.float32)  # (Th, W, C)
    acc_ref[0, :] += jnp.sum(x, axis=(0, 1))
    acc_ref[1, :] += jnp.sum(x * x, axis=(0, 1))
    stats_ref[0] = acc_ref[...]


def _norm_kernel(x_ref, stats_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float, n_elems: float):
    """Pass 2: per-channel stats -> group stats via one-hot matmul, broadcast
    back per channel, then write silu(gn(x))."""
    x = x_ref[0].astype(jnp.float32)
    Th, W, C = x.shape
    M = _group_onehot(C, groups)  # (C, g)
    s = stats_ref[0]  # (2, C) per-channel sum / sumsq
    group = jnp.dot(s, M, preferred_element_type=jnp.float32)  # (2, g)
    per_ch = jnp.dot(group, M.T, preferred_element_type=jnp.float32)  # (2, C) broadcast back
    mean_c = per_ch[0] / n_elems
    var_c = per_ch[1] / n_elems - mean_c * mean_c
    rstd_c = jax.lax.rsqrt(var_c + eps)
    y = (x - mean_c[None, None, :]) * rstd_c[None, None, :]
    y = y * scale_ref[0, :][None, None, :] + bias_ref[0, :][None, None, :]
    y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm_silu_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int, eps: float = 1e-5):
    return _forward(x, scale, bias, groups, eps)


def _forward(x, scale, bias, groups, eps):
    B, H, W, C = x.shape
    th = _pick_tile(H, W, C)
    n_tiles = H // th
    n_elems = float(H * W * (C // groups))

    stats = pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, th, W, C), lambda b, h: (b, h, 0, 0))],
        out_specs=pl.BlockSpec((1, 2, C), lambda b, h: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
    )(x)

    return pl.pallas_call(
        functools.partial(_norm_kernel, groups=groups, eps=eps, n_elems=n_elems),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, th, W, C), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 2, C), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, C), lambda b, h: (0, 0)),
            pl.BlockSpec((1, C), lambda b, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, W, C), lambda b, h: (b, h, 0, 0)),
    )(x, stats, scale.reshape(1, C).astype(jnp.float32), bias.reshape(1, C).astype(jnp.float32))


def _jnp_ref(x, scale, bias, groups, eps):
    from .groupnorm import group_norm

    y = group_norm(x, (scale, bias), groups, eps)
    return y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)


def _fwd(x, scale, bias, groups, eps):
    return _forward(x, scale, bias, groups, eps), (x, scale, bias)


def _bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda xx, ss, bb: _jnp_ref(xx, ss, bb, groups, eps), x, scale, bias)
    return vjp(g)


group_norm_silu_pallas.defvjp(_fwd, _bwd)
