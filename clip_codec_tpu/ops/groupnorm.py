"""GroupNorm(+SiLU) — the hot normalization op of every ResBlock.

This is the designated fusion point for the U-Net's elementwise chain
(reference equivalent: ``nn.GroupNorm`` + ``nn.SiLU`` in
``models/blocks.py:33-44``). The default path is pure jnp — XLA already fuses
normalize+SiLU into neighboring convs well — and a Pallas TPU kernel can be
enabled process-wide for the cases where hand-fusion beats XLA (profiled on
real hardware; see clip_codec_tpu/ops/pallas_groupnorm.py).

Statistics are computed in fp32 regardless of the compute dtype (bf16-safe),
matching torch's fp32 GroupNorm semantics under autocast. (float64 inputs
keep float64 stats — a test-only path that makes fp64 a true oracle for
the folded-layout parity tests.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_USE_PALLAS = False  # flipped by clip_codec_tpu.ops.enable_pallas()
# Flash attention: None = auto (on for TPU backends, off elsewhere); the
# kernel is a measured win at SD shapes (1.28-1.44x + O(N) memory), unlike
# the GroupNorm fusion which only matches XLA.
_USE_FLASH = None


def set_pallas(enabled: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = enabled


def set_flash_attention(enabled) -> None:
    """True/False forces; None restores auto (TPU: on, others: off)."""
    global _USE_FLASH
    _USE_FLASH = enabled


def flash_enabled() -> bool:
    """Truly independent of the GroupNorm switch: auto = TPU-only."""
    if _USE_FLASH is not None:
        return bool(_USE_FLASH)
    import jax

    return jax.default_backend() == "tpu"


_USE_FUSED_MLP = None  # None = follow the flash knob


def set_fused_mlp(enabled) -> None:
    """Process default for the fused transformer-MLP kernel
    (ops/pallas_mlp.py): True/False forces, None restores auto (= the flash
    knob). Per-model override: ``SDUNet(fused_mlp=...)``."""
    global _USE_FUSED_MLP
    _USE_FUSED_MLP = enabled


def fused_mlp_enabled() -> bool:
    if _USE_FUSED_MLP is not None:
        return bool(_USE_FUSED_MLP)
    return flash_enabled()


def _gn_stats(x32: jax.Array, groups: int) -> Tuple[jax.Array, jax.Array]:
    B, H, W, C = x32.shape
    xg = x32.reshape(B, H, W, groups, C // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    return mean, var


def group_norm(
    x: jax.Array,
    scale_bias: Tuple[jax.Array, jax.Array],
    groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """Plain GroupNorm over NHWC (per-sample, per-group over H, W, C/groups)."""
    scale, bias = scale_bias
    B, H, W, C = x.shape
    x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    mean, var = _gn_stats(x32, groups)
    xg = x32.reshape(B, H, W, groups, C // groups)
    y = (xg - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(B, H, W, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm_silu(
    x: jax.Array,
    scale_bias: Tuple[jax.Array, jax.Array],
    groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """Fused GroupNorm + SiLU."""
    if _USE_PALLAS:
        from .pallas_groupnorm import group_norm_silu_pallas

        return group_norm_silu_pallas(x, scale_bias[0], scale_bias[1], groups, eps)
    y = group_norm(x, scale_bias, groups, eps)
    return y * jax.nn.sigmoid(y.astype(jnp.promote_types(y.dtype, jnp.float32))).astype(y.dtype)
