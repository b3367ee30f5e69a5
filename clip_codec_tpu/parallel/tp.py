"""Tensor parallelism for the SD-1.5 UNet (Megatron-style, via GSPMD).

The reference has no tensor parallelism (SURVEY.md §2.5 — its SD UNet runs
single-GPU through diffusers, ``models/sd_decoder.py:39-42``). The pixel
U-Net (~35M params) never needs it, but the SD latent path carries an 860M
parameter UNet whose serving latency at low batch is bounded by per-chip
FLOPs — the classic case for sharding the *model* over the ``model`` mesh
axis.

Design (TPU-first): no model-code changes and no hand-written collectives.
We shard only the **parameters**, with the standard Megatron layout on every
spatial-transformer block, and let GSPMD propagate:

- attention ``to_q/to_k/to_v`` kernels column-parallel ``P(None, 'model')``
  → each device computes ``heads / n_model`` full heads locally;
- attention ``to_out`` kernel row-parallel ``P('model', None)`` → XLA
  inserts one ``psum`` per attention block (rides ICI);
- GEGLU ``proj_h``/``proj_g`` column-parallel (biases sharded with them) —
  the two projections are separate Dense params precisely so each half
  shards independently and ``a * gelu(g)`` stays device-local — then
  ``ff_out`` row-parallel → one ``psum`` per MLP.

Everything else (convs, norms, time embedding) stays replicated: resnet
convolutions scale via *spatial* sharding instead (``sample_spatial_sharded``
— halo exchanges are cheaper than per-conv all-reduces at SD widths, and
channel-sharded GroupNorm would add cross-device moment reductions to every
resnet). Combining head-TP for transformers with replicated convs keeps the
activations replicated between blocks, so the only collectives in the
program are the three psums per transformer block (self-attention,
cross-attention, MLP) — verified by an HLO collective-count test: zero
all-gather / all-to-all (``tests/test_tp.py``).

Requirements checked by :func:`validate_tp`: ``heads``, every transformer
width and ``4*width`` (GEGLU hidden) divisible by the model-axis size.

Flash attention composes with this layout: the self-attention path uses the
head-batched ``flash_attention_heads`` wrapper
(:mod:`clip_codec_tpu.ops.pallas_attention`), whose custom partitioning rule
runs the kernel per-device on its local heads — head-sharded q/k/v flow
through with no resharding collectives, so TP keeps the kernel's speedup at
the low-batch serving latencies TP exists for (pinned by the flash-on TP
equivalence + HLO collective-count tests in ``tests/test_tp.py``).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

_COL = {"to_q", "to_k", "to_v"}  # column-parallel attention projections
_ROW = {"to_out", "ff_out"}  # row-parallel (psum after local contraction)


def _rule(path: tuple, leaf) -> P:
    """Partition spec for one SD-UNet parameter, by its module path."""
    name = path[-1]  # 'kernel' | 'bias' | '*_scale' | '*_bias'
    parent = path[-2] if len(path) >= 2 else ""
    if parent in _COL:
        # (in, out) kernel, sharded on the head/output dim; no bias in SD's
        # to_q/k/v, but sized-down test configs may add one.
        return P(None, MODEL_AXIS) if name == "kernel" else P(MODEL_AXIS)
    if parent in _ROW:
        # (in, out) kernel sharded on the contraction dim -> partial sums;
        # the bias is added once after the psum, so it stays replicated.
        return P(MODEL_AXIS, None) if name == "kernel" else P()
    if parent in ("proj_h", "proj_g") and len(path) >= 3 and path[-3] == "ff_geglu":
        # GEGLU hidden/gate projections are SEPARATE Dense params exactly so
        # each can be column-sharded here — the elementwise a * gelu(g) is
        # then local per device and feeds row-parallel ff_out directly.
        return P(None, MODEL_AXIS) if name == "kernel" else P(MODEL_AXIS)
    return P()


def sd_unet_tp_specs(params: Mapping[str, Any]):
    """PartitionSpec pytree for SD-UNet ``params`` (the ``'params'`` subtree
    of the Flax variables), Megatron layout on the transformer blocks."""
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict({p: _rule(p, v) for p, v in flat.items()})


def validate_tp(cfg, n_model: int) -> None:
    """Raise early (with the offending dimension) if ``cfg`` cannot shard
    over ``n_model`` devices."""
    if n_model <= 1:
        return
    if cfg.heads % n_model:
        raise ValueError(f"heads={cfg.heads} not divisible by model axis {n_model}")
    # Attention-bearing widths are ALL of block_out: down blocks 0..n-2
    # attend at their own width, and although the last down block is
    # attention-free, the mid-block Transformer2D and the first up block
    # attend at block_out[-1] — an indivisible final width would pass a
    # down-only check and then shard unevenly (GSPMD padding).
    for ch in cfg.block_out:
        if ch % n_model:
            raise ValueError(f"block width {ch} not divisible by model axis {n_model}")


def shard_params_tp(mesh: Mesh, params, specs=None):
    """Place ``params`` on ``mesh`` with tensor-parallel shardings.

    ``specs`` defaults to :func:`sd_unet_tp_specs`. Host numpy trees are
    sharded directly (each device receives only its slice). No process
    state is touched — flash attention stays available under TP via its
    head-batched custom partitioning rule."""
    if specs is None:
        specs = sd_unet_tp_specs(params)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs
    )
