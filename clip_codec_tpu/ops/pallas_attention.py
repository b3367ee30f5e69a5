"""Pallas TPU flash attention for the SD spatial transformer (no mask).

At SD-1.5's 512px resolution the latent self-attention runs over N=4096
tokens; a materialized (heads, N, N) logits tensor is ~0.5 GB fp32 per image.
This kernel computes softmax(q k^T / sqrt(d)) v with the online-softmax
recurrence — the attention matrix never exists, HBM traffic drops from
O(N^2) to O(N d).

Layout: grid ``(B*H, q_tiles, k_tiles)`` — the k axis is innermost, so the
output block (indexed by (bh, q) only) is revisited in consecutive
iterations: the legal Pallas reduction pattern. Running (max, sum, acc)
state lives in VMEM scratch, reset at k==0 and flushed at the last k tile.
Softmax statistics are fp32 regardless of input dtype.

Correctness vs the jnp reference is asserted in interpret mode
(tests/test_pallas_ops.py); use from :class:`models.sd.layers.CrossAttention`
via ``ops.enable_pallas()`` for self-attention at sampling time.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_tile(n: int, target: int = 512) -> int:
    for t in (target, 1024, 512, 256, 128, 64, 32, 16, 8):
        if n % t == 0 and t <= n:
            return t
    return n


def _tile_target(d: int) -> int:
    """Bigger tiles for small head dims: at D<=64 the per-tile dots are
    lane-padded (D of 128), so the fixed per-tile softmax/rescale VPU work
    dominates — 1024-tiles measured 1.9x over 512-tiles at (64, 4096, 40),
    the SD-1.5 64x64 self-attention shape."""
    return 1024 if d <= 64 else 512


def _ktile_target(d: int) -> int:
    """Forward K-tile target. STANDALONE the (1024, 2048) exp2 kernel beats
    (1024, 1024) at the SD (64, 4096, 40) shape (3.70 vs 3.86 ms,
    bench_attn_probe.py) — but IN CONTEXT (inside Transformer2D, with the
    projections around it) tk=2048 regresses the whole block 5.90 -> 6.15 ms
    (bench_mlp_probe.py): the doubled s/p VMEM footprint fights the
    surrounding ops' scheduling. Square tiles kept — the standalone win does
    not transfer."""
    return _tile_target(d)


LOG2E = float(np.log2(np.e))


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref, *, scale: float):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _reset():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Dots run in the INPUT dtype with fp32 accumulation: for bf16 inputs the
    # MXU multiplies bf16 exactly into an fp32 accumulator, so upcasting the
    # operands first would only halve the MXU rate without changing a bit of
    # the QK^T result.
    q = q_ref[0]  # (Tq, D)
    k = k_ref[0]  # (Tk, D)
    v = v_ref[0]  # (Tk, D)

    # log2 domain throughout: exp(x) lowers to exp2(x * log2e), i.e. a hidden
    # (Tq, Tk) multiply pass per tile. Folding log2e into the logits scale
    # (fp32, in-kernel — folding into bf16 q would double the input rounding)
    # and calling exp2 directly removes it: measured 4.07 -> 3.70 ms together
    # with the wider k tiles at the SD (64, 4096, 40) shape. The HW
    # transcendental itself is NOT beatable: a deg-2/3 polynomial exp2
    # (floor/bitcast exponent assembly) measured 5.1 ms (bench_attn_probe.py).
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2E)  # (Tq, Tk) fp32, log2-domain logits

    m_prev = m_ref[:, 0]  # (Tq,)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp2(m_prev - m_cur)  # rescale factor for old state
    p = jnp.exp2(s - m_cur[:, None])  # (Tq, Tk) fp32
    l_cur = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
    # P·V in v's dtype (the FlashAttention-2 choice): row sums above stay
    # fp32, and for fp32 inputs nothing changes. A bf16-exp variant was
    # measured at parity on chip (6.06 vs 6.16 ms for the SD 64x64
    # transformer) — the VPU exp is not the bottleneck, so precision wins.
    acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:, 0] = m_cur
    l_ref[:, 0] = l_cur

    @pl.when(kk == nk - 1)
    def _flush():
        o_ref[0] = (acc_ref[...] / l_ref[:, 0][:, None]).astype(o_ref.dtype)
        # natural-log lse on the API surface (backward converts back)
        lse_ref[0, :, 0] = (m_ref[:, 0] + jnp.log2(l_ref[:, 0])) * (1.0 / LOG2E)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None) -> jax.Array:
    """q, k, v: (BH, N, D) -> (BH, N, D) softmax(q k^T * scale) v, no mask.

    Differentiable end-to-end in flash form: the backward recomputes
    probability tiles from the saved logsumexp (never materializing the
    (N, N) matrix) in two Pallas kernels — dq accumulated over k tiles,
    dk/dv accumulated over q tiles."""
    return _flash_forward(q, k, v, scale)


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None,
                   with_lse: bool = False):
    BH, N, D = q.shape
    Nk = k.shape[1]
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    tq = _pick_tile(N, _tile_target(D))
    tk = _pick_tile(Nk, _ktile_target(D))
    grid = (BH, N // tq, Nk // tk)
    kern = functools.partial(_flash_kernel, scale=float(scale))
    out, lse = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((BH, N, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, tk, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, tk, D), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, iq, ik: (b, iq, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),  # running max
            pltpu.VMEM((tq, 1), jnp.float32),  # running sum
            pltpu.VMEM((tq, D), jnp.float32),  # output accumulator
        ],
    )(q, k, v)
    return (out, lse[..., 0]) if with_lse else out


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None) -> jax.Array:
    """Materializing jnp reference (what XLA runs without the kernel)."""
    D = q.shape[-1]
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


# ------------------------------------------------------------- flash backward
#
# With row logsumexp L_i saved from the forward:
#   p_ij = exp(scale q_i.k_j - L_i)
#   D_i  = rowsum(dO_i * O_i)
#   dv_j = sum_i p_ij dO_i
#   ds   = p * (dO v^T - D_i)
#   dq_i = scale * sum_j ds_ij k_j      (accumulated over k tiles)
#   dk_j = scale * sum_i ds_ij q_i      (accumulated over q tiles)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dq_ref, acc_ref, *, scale: float):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _reset():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # same dtype policy as the forward: operand-dtype dots, fp32 accumulation
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0, :, 0]  # lse * log2(e), precomputed outside
    dvec = dvec_ref[0, :, 0]

    # log2-domain p recompute (same value as exp(s*scale - lse), one fewer
    # (Tq, Tk) multiply pass — see the forward kernel's note)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * (scale * LOG2E)
    p = jnp.exp2(s - lse2[:, None])
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dvec[:, None])
    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ik == nk - 1)
    def _flush():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dvec_ref, dk_ref, dv_ref,
                    dk_acc, dv_acc, *, scale: float):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _reset():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]
    do = do_ref[0]
    lse2 = lse_ref[0, :, 0]  # lse * log2(e)
    dvec = dvec_ref[0, :, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * (scale * LOG2E)
    p = jnp.exp2(s - lse2[:, None])  # (Tq, Tk) fp32
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dvec[:, None])  # (Tq, Tk)
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(iq == nq - 1)
    def _flush():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_tile_target(d: int) -> int:
    """Backward tile target, D-dependent like the forward's but capped lower:
    the backward keeps ~4 (Tq, Tk) fp32 intermediates live (s, p, dp, ds), so
    VMEM pressure bites earlier. Measured on v5e at the SD self-attention
    shapes (fwd+bwd, bf16): (32,4096,40) 256→512 is **1.18x** (73.4→62.4 ms,
    1024 regresses to 1.09x); (32,1024,80) flat within 4%; (32,256,160)
    512 is 0.92x and 1024 0.44x. So: 512 for lane-padded small heads
    (D<=64), 256 otherwise."""
    return 512 if d <= 64 else 256


def _flash_backward(q, k, v, out, lse, g, scale):
    BH, N, D = q.shape
    Nk = k.shape[1]
    tq = _pick_tile(N, _bwd_tile_target(D))
    tk = _pick_tile(Nk, _bwd_tile_target(D))
    dvec = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)  # (BH, N, 1)
    lse3 = (lse * LOG2E)[..., None]  # log2-domain for the in-kernel exp2

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=float(scale)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(BH, N // tq, Nk // tk),
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, tk, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, tk, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, tq, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, D), lambda b, iq, ik: (b, iq, 0)),
        scratch_shapes=[pltpu.VMEM((tq, D), jnp.float32)],
    )(q, k, v, g, lse3, dvec)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=float(scale)),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(BH, Nk // tk, N // tq),
        in_specs=[
            pl.BlockSpec((1, tk, D), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, tk, D), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, tq, D), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, tq, D), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, tq, 1), lambda b, ik, iq: (b, iq, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tk, D), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, tk, D), lambda b, ik, iq: (b, ik, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((tk, D), jnp.float32),
            pltpu.VMEM((tk, D), jnp.float32),
        ],
    )(k, v, q, g, lse3, dvec)
    return dq, dk, dv


def _flash_fwd(q, k, v, scale):
    out, lse = _flash_forward(q, k, v, scale, with_lse=True)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, res, g):
    q, k, v, out, lse = res
    if scale is None:
        scale = 1.0 / float(q.shape[-1]) ** 0.5
    return _flash_backward(q, k, v, out, lse, g, scale)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ------------------------------------------- TP-composable head-batched form
#
# The (BH, N, D) kernel folds heads into its grid's batch axis, which GSPMD
# cannot partition — under Megatron head-sharded q/k/v (parallel/tp.py) a
# bare pallas_call would force an all-gather of the activations. This wrapper
# keeps q/k/v as explicit (B, H, N, D) and registers a custom partitioning
# rule: shardings on the batch and head axes pass straight through, each
# device runs the unchanged kernel on its local heads, and attention stays
# collective-free (the block's one psum remains the row-parallel ``to_out``).
#
# The local implementation dispatches on backend: the Mosaic kernel on TPU,
# the einsum reference elsewhere (same math; interpret-mode Pallas uses an
# io_callback whose ordered effect cannot lower inside a partition body, and
# a real non-TPU deployment has no Mosaic anyway). Kernel numerics are pinned
# separately in interpret mode (tests/test_pallas_ops.py); the partitioned
# wrapper's equivalence and collective counts are pinned on the 8-device CPU
# mesh (tests/test_tp.py).


def _use_mosaic() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # no backend yet (abstract lowering) — be safe
        return False


def _heads_fwd_local(q, k, v):
    """(B, H, N, D) local shards -> (out, lse) with lse (B, H, N) fp32."""
    B, H, N, D = q.shape
    M = k.shape[2]
    if _use_mosaic():
        out, lse = _flash_forward(
            q.reshape(B * H, N, D), k.reshape(B * H, M, D), v.reshape(B * H, M, D),
            with_lse=True,
        )
        return out.reshape(B, H, N, D), lse.reshape(B, H, N)
    scale = 1.0 / float(D) ** 0.5
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    lse = jax.scipy.special.logsumexp(s, axis=-1)
    p = jnp.exp(s - lse[..., None])
    out = jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32)).astype(q.dtype)
    return out, lse


def _heads_bwd_local(q, k, v, out, lse, g):
    B, H, N, D = q.shape
    M = k.shape[2]
    scale = 1.0 / float(D) ** 0.5
    if _use_mosaic():
        r3 = lambda a, n: a.reshape(B * H, n, D)
        dq, dk, dv = _flash_backward(
            r3(q, N), r3(k, M), r3(v, M), r3(out, N), lse.reshape(B * H, N),
            r3(g, N), scale,
        )
        return dq.reshape(B, H, N, D), dk.reshape(B, H, M, D), dv.reshape(B, H, M, D)
    _, vjp = jax.vjp(lambda q_, k_, v_: _heads_fwd_local(q_, k_, v_)[0], q, k, v)
    return vjp(g)


def _heads_spec(mesh, shapes, trailing_unsharded: int):
    """Result/operand sharding: keep the leading (batch, head) axes of the
    first operand, replicate everything after them."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = shapes[0].sharding.spec
    lead = tuple(spec[i] if len(spec) > i else None for i in range(2))
    return NamedSharding(mesh, P(*lead, *((None,) * trailing_unsharded)))


def _make_partitioned(fun, n_out_trailing):
    """Wrap ``fun`` (all (B, H, ...) operands/results) so the SPMD
    partitioner runs it per-shard over the batch/head axes."""
    from jax.experimental.custom_partitioning import (
        SdyShardingRule,
        custom_partitioning,
    )

    wrapped = custom_partitioning(fun)

    def _infer(mesh, arg_shapes, result_shape):
        res = jax.tree_util.tree_leaves(result_shape)
        outs = tuple(
            _heads_spec(mesh, arg_shapes, r.ndim - 2) for r in res
        )
        return outs if len(outs) > 1 else outs[0]

    def _partition(mesh, arg_shapes, result_shape):
        arg_sh = tuple(
            _heads_spec(mesh, arg_shapes, a.ndim - 2) for a in arg_shapes
        )
        return mesh, fun, _infer(mesh, arg_shapes, result_shape), arg_sh

    # Shardy propagation rule: batch/head factors shard, token/feature
    # factors replicate (n: q tokens, m: kv tokens, d: head dim).
    operand_factors = tuple(("b", "h") + t for t in n_out_trailing[0])
    result_factors = tuple(("b", "h") + t for t in n_out_trailing[1])
    wrapped.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer,
        sharding_rule=SdyShardingRule(operand_factors, result_factors),
    )
    return wrapped


_fwd4 = _make_partitioned(
    _heads_fwd_local,
    ((("n", "d"), ("m", "d"), ("m", "d")), (("n", "d"), ("n",))),
)
_bwd4 = _make_partitioned(
    _heads_bwd_local,
    (
        (("n", "d"), ("m", "d"), ("m", "d"), ("n", "d"), ("n",), ("n", "d")),
        (("n", "d"), ("m", "d"), ("m", "d")),
    ),
)


@jax.custom_vjp
def flash_attention_heads(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Flash attention over (B, H, N, D) with default 1/sqrt(D) scaling.

    Composes with GSPMD tensor parallelism: head-sharded (Megatron
    column-parallel) q/k/v run the kernel on local heads per device with no
    resharding collectives. Differentiable (flash-form backward)."""
    out, _ = _fwd4(q, k, v)
    return out


def _heads_vjp_fwd(q, k, v):
    out, lse = _fwd4(q, k, v)
    return out, (q, k, v, out, lse)


def _heads_vjp_bwd(res, g):
    q, k, v, out, lse = res
    return _bwd4(q, k, v, out, lse, g)


flash_attention_heads.defvjp(_heads_vjp_fwd, _heads_vjp_bwd)
