"""Fused transformer-MLP Pallas kernel: LayerNorm -> GEGLU -> out-proj.

The SD spatial transformer's MLP tail (``models/sd/layers.py``
``BasicTransformerBlock``: ``norm3`` -> ``ff_geglu`` -> ``ff_out`` -> residual,
mirroring the reference's diffusers blocks at
``/root/reference/src/clip_feature_codec/models/sd_decoder.py:39-42``) is
HBM-bound under XLA: at (B=8, N=4096, C=320) the 4x-width hidden pair
(a, gate) is materialized twice, re-read, and the product written again —
~600 MB of traffic for ~80 GFLOP of matmul. This kernel computes the whole
segment per row-tile in VMEM: the hidden never exists in HBM, traffic drops
to one read of ``x`` and one write of the partial output.

Grid ``(rows, f_tiles)`` with the hidden (f) axis innermost accumulating
into the output block — the legal Pallas reduction pattern. The LayerNorm
is computed once per row-tile (at f == 0) into VMEM scratch and reused by
every f step. Weights ride VMEM blocks: full-F for the 320/640-wide stages,
f-tiled for 1280-wide (whose weights exceed VMEM).

Numerics follow the module path: fp32 LN statistics (flax ``use_fast_variance``
form), bf16 matmul operands with fp32 accumulation, gate values cast to the
compute dtype before the exact-erf GELU — parity with the unfused modules is
pinned to bf16-rounding tolerance in tests/test_pallas_mlp.py.

Returns the MLP value WITHOUT the residual add or the final bias: callers
add ``x + mlp + bo`` outside (one XLA-fused elementwise pass). That keeps
the kernel's output a pure contraction over f — which is also what makes
the op GSPMD-friendly: the custom-partitioning wrapper (same pattern as
``pallas_attention._make_partitioned``) passes batch/token shardings
through and replicates weights, so DP/spatial-sharded inputs run the
kernel per-shard with no collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6  # flax nn.LayerNorm default, what BasicTransformerBlock uses

# Eigen/XLA's single-precision erf rational approximation (x * P(x^2)/Q(x^2)
# on the clamped range |x| <= 4) — Mosaic has no erf lowering
# (NotImplementedError: "Unimplemented primitive ... erf"), so the kernel
# carries the same polynomial XLA itself expands erf into; agreement with
# jax.lax.erf is ~1 ulp (pinned in tests/test_pallas_mlp.py).
_ERF_ALPHA = (
    -2.72614225801306e-10, 2.77068142495902e-08, -2.10102402082508e-06,
    -5.69250639462346e-05, -7.34990630326855e-04, -2.95459980854025e-03,
    -1.60960333262415e-02,
)
_ERF_BETA = (
    -1.45660718464996e-05, -2.13374055278905e-04, -1.68282697438203e-03,
    -7.37332916720468e-03, -1.42647390514189e-02,
)


def _erf_poly(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(c)
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(c)
    return (x * p) / q


def _gelu_exact(g, erf=jax.lax.erf):
    return g * 0.5 * (1.0 + erf(g * np.float32(1.0 / np.sqrt(2.0))))


def _mlp_kernel(x_ref, lns_ref, lnb_ref, wh_ref, bh_ref, wg_ref, bg_ref,
                wo_ref, o_ref, xn_ref, acc_ref, *, cdtype):
    f = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(f == 0)
    def _ln():
        x = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
        xn = (x - mu) * jax.lax.rsqrt(var + LN_EPS)
        xn_ref[...] = (xn * lns_ref[0] + lnb_ref[0]).astype(xn_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xn = xn_ref[...]
    a = jax.lax.dot_general(
        xn, wh_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bh_ref[0]
    g = jax.lax.dot_general(
        xn, wg_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bg_ref[0]
    # match the module path: each Dense output is cast to the compute dtype
    # before the gate math (gelu itself runs fp32 from those rounded values)
    a = a.astype(cdtype).astype(jnp.float32)
    g = g.astype(cdtype).astype(jnp.float32)
    h = (a * _gelu_exact(g, erf=_erf_poly)).astype(cdtype)
    acc_ref[...] += jax.lax.dot_general(
        h, wo_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(f == nf - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick_tiles(R: int, C: int, F: int):
    """(Tm, Tf) or None when the shape doesn't tile cleanly.

    VMEM budget: weights 2*(C*Tf) + Tf*C bf16 + fp32 (Tm,Tf) a/g + (Tm,C)
    acc — Tf capped so the 1280-wide stage streams its weights."""
    tf = F
    while tf * C * 2 * 3 > 6 * 2**20:  # keep weight blocks under ~6 MB
        if tf % 2:
            return None
        tf //= 2
    tm = 512 if C <= 384 else 256
    while tm > R or R % tm:
        tm //= 2
    if tm < 16 or F % tf or tf % 128:
        return None
    return tm, tf


def _mlp_pallas(x2, lns, lnb, wh, bh, wg, bg, wo, tiles):
    R, C = x2.shape
    F = wh.shape[1]
    tm, tf = tiles
    cdtype = x2.dtype
    return pl.pallas_call(
        functools.partial(_mlp_kernel, cdtype=cdtype),
        out_shape=jax.ShapeDtypeStruct((R, C), x2.dtype),
        grid=(R // tm, F // tf),
        in_specs=[
            pl.BlockSpec((tm, C), lambda r, f: (r, 0)),
            pl.BlockSpec((1, C), lambda r, f: (0, 0)),
            pl.BlockSpec((1, C), lambda r, f: (0, 0)),
            pl.BlockSpec((C, tf), lambda r, f: (0, f)),
            pl.BlockSpec((1, tf), lambda r, f: (0, f)),
            pl.BlockSpec((C, tf), lambda r, f: (0, f)),
            pl.BlockSpec((1, tf), lambda r, f: (0, f)),
            pl.BlockSpec((tf, C), lambda r, f: (f, 0)),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda r, f: (r, 0)),
        scratch_shapes=[
            pltpu.VMEM((tm, C), cdtype),      # normalized x, reused per f
            pltpu.VMEM((tm, C), jnp.float32),  # output accumulator
        ],
    )(x2, lns.reshape(1, C), lnb.reshape(1, C), wh, bh.reshape(1, F),
      wg, bg.reshape(1, F), wo)


def mlp_reference(x, lns, lnb, wh, bh, wg, bg, wo):
    """jnp math of the fused segment (WITHOUT residual / final bias): what
    XLA runs off-TPU and what the backward differentiates. Mirrors the
    module path: flax-LayerNorm fp32 stats, per-Dense casts to x.dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = ((xf - mu) * jax.lax.rsqrt(var + LN_EPS) * lns + lnb).astype(x.dtype)
    a = (xn @ wh.astype(x.dtype) + bh).astype(x.dtype)
    g = (xn @ wg.astype(x.dtype) + bg).astype(x.dtype)
    h = (a.astype(jnp.float32) * _gelu_exact(g.astype(jnp.float32))).astype(x.dtype)
    return (h @ wo.astype(x.dtype)).astype(x.dtype)


def _use_mosaic() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # abstract lowering without a backend — be safe
        return False


# Measured crossover on v5e (whole SD-1.5 UNet forward, bench_sd.py): the
# kernel wins at large row counts (B=8: 64.3 -> 62.0 ms with every block
# fused) but LOSES badly at small ones (B=1: 12.1 -> 19.8 ms — at R<=4096
# there isn't enough work per weight-stream to hide the f-tiled weight DMA,
# and the (64, 4096) mid-block measured +0.5 ms alone). Below this many
# local rows the op runs the XLA reference instead.
MIN_FUSED_ROWS = 8192


def _mlp_local(x, lns, lnb, wh, bh, wg, bg, wo):
    """(B, N, C) local shard -> (B, N, C) MLP value (no residual/bo)."""
    B, N, C = x.shape
    F = wh.shape[1]
    tiles = _pick_tiles(B * N, C, F)
    if B * N < MIN_FUSED_ROWS:
        tiles = None
    if _use_mosaic() and tiles is not None:
        out = _mlp_pallas(
            x.reshape(B * N, C), lns, lnb,
            wh.astype(x.dtype), bh, wg.astype(x.dtype), bg, wo.astype(x.dtype),
            tiles,
        )
        return out.reshape(B, N, C)
    return mlp_reference(x, lns, lnb, wh, bh, wg, bg, wo)


def _make_mlp_partitioned(fun):
    """GSPMD wrapper, two sharded dimensions understood natively:

    * operand 0's (batch, token) shardings pass through to the result — the
      DP / spatial-sharded case: each device runs the kernel on its rows;
    * the GEGLU hidden axis (``wh``/``wg`` columns, ``wo`` rows, Megatron
      column-parallel as laid out by ``parallel/tp.py``): each device
      computes the partial MLP over its local hidden shard and the wrapper
      psums — the SAME one-collective-per-MLP the unfused path has.

    Everything else (LN params, the ``c`` axis) is replicated."""
    from jax.experimental.custom_partitioning import (
        SdyShardingRule,
        custom_partitioning,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    wrapped = custom_partitioning(fun)

    def _x_spec(mesh, arg_shapes):
        spec = arg_shapes[0].sharding.spec
        lead = tuple(spec[i] if len(spec) > i else None for i in range(2))
        return NamedSharding(mesh, P(*lead, None))

    def _infer(mesh, arg_shapes, result_shape):
        return _x_spec(mesh, arg_shapes)

    def _f_axes(arg_shapes):
        """Mesh axes sharding the hidden dim, read off wh's column spec."""
        spec = arg_shapes[3].sharding.spec
        ax = spec[1] if len(spec) > 1 else None
        if ax is None:
            return ()
        return tuple(ax) if isinstance(ax, tuple) else (ax,)

    def _partition(mesh, arg_shapes, result_shape):
        xs = _x_spec(mesh, arg_shapes)
        f = _f_axes(arg_shapes)
        fspec = f if f else None
        rep = NamedSharding(mesh, P())
        arg_sh = (
            xs,
            rep, rep,                                # LN scale/bias
            NamedSharding(mesh, P(None, fspec)),     # wh
            NamedSharding(mesh, P(fspec)),           # bh
            NamedSharding(mesh, P(None, fspec)),     # wg
            NamedSharding(mesh, P(fspec)),           # bg
            NamedSharding(mesh, P(fspec, None)),     # wo
        )
        if f:
            def local(*args):
                return jax.lax.psum(fun(*args), f)
        else:
            local = fun
        return mesh, local, _infer(mesh, arg_shapes, result_shape), arg_sh

    wrapped.def_partition(
        partition=_partition,
        infer_sharding_from_operands=_infer,
        sharding_rule=SdyShardingRule(
            (
                ("b", "n", "c"),
                ("c",), ("c",),
                ("c", "f"), ("f",),
                ("c", "f"), ("f",),
                ("f", "c"),
            ),
            (("b", "n", "c"),),
        ),
    )
    return wrapped


_mlp_part = _make_mlp_partitioned(_mlp_local)


@jax.custom_vjp
def transformer_mlp(x, lns, lnb, wh, bh, wg, bg, wo):
    """Fused LN -> GEGLU -> out-projection over (B, N, C) tokens.

    Returns the MLP value; the caller adds the residual and the final
    out-projection bias (``x + transformer_mlp(...) + bo``). Differentiable:
    the backward recomputes through the jnp reference math (the hidden is
    materialized only inside the backward, exactly as XLA's unfused VJP
    would)."""
    return _mlp_part(x, lns, lnb, wh, bh, wg, bg, wo)


def _mlp_vjp_fwd(x, lns, lnb, wh, bh, wg, bg, wo):
    return _mlp_part(x, lns, lnb, wh, bh, wg, bg, wo), (x, lns, lnb, wh, bh, wg, bg, wo)


def _mlp_vjp_bwd(res, g):
    _, vjp = jax.vjp(mlp_reference, *res)
    return vjp(g)


transformer_mlp.defvjp(_mlp_vjp_fwd, _mlp_vjp_bwd)
