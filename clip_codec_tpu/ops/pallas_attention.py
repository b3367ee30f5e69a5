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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_tile(n: int, target: int = 512) -> int:
    for t in (target, 256, 128, 64, 32, 16, 8):
        if n % t == 0 and t <= n:
            return t
    return n


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale: float):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _reset():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)  # (Tq, D)
    k = k_ref[0].astype(jnp.float32)  # (Tk, D)
    v = v_ref[0].astype(jnp.float32)  # (Tk, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Tq, Tk)

    m_prev = m_ref[:, 0]  # (Tq,)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_cur)  # rescale factor for old state
    p = jnp.exp(s - m_cur[:, None])  # (Tq, Tk)
    l_cur = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
    acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:, 0] = m_cur
    l_ref[:, 0] = l_cur

    @pl.when(kk == nk - 1)
    def _flush():
        o_ref[0] = (acc_ref[...] / l_ref[:, 0][:, None]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None) -> jax.Array:
    """q, k, v: (BH, N, D) -> (BH, N, D) softmax(q k^T * scale) v, no mask.

    Differentiable: the backward pass is the VJP of the reference math (it
    materializes the attention matrix — fine for training, where activation
    memory dominates anyway; the forward stays flash)."""
    return _flash_forward(q, k, v, scale)


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array, scale: Optional[float] = None) -> jax.Array:
    BH, N, D = q.shape
    Nk = k.shape[1]
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    tq = _pick_tile(N)
    tk = _pick_tile(Nk)
    grid = (BH, N // tq, Nk // tk)
    kern = functools.partial(_flash_kernel, scale=float(scale))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, tk, D), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, tk, D), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, D), lambda b, iq, ik: (b, iq, 0)),
        scratch_shapes=[
            pltpu.VMEM((tq, 1), jnp.float32),  # running max
            pltpu.VMEM((tq, 1), jnp.float32),  # running sum
            pltpu.VMEM((tq, D), jnp.float32),  # output accumulator
        ],
    )(q, k, v)


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array, scale: float | None = None) -> jax.Array:
    """Materializing jnp reference (what XLA runs without the kernel)."""
    D = q.shape[-1]
    if scale is None:
        scale = 1.0 / float(D) ** 0.5
    logits = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _flash_fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda qq, kk, vv: attention_reference(qq, kk, vv, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
