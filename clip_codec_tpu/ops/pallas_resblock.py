"""Fused FiLM-modulated ResBlock inner loop — the SURVEY §2.4 north-star.

The reference ResBlock (``models/blocks.py:28-44``) is, per conv:

    y = conv3x3( silu( gn(x) [* (1+s) + b] ) ) (+ residual)

On TPU, XLA cannot fuse elementwise producers/consumers into a convolution
(convs lower to unfusable library calls), so the chain costs ~6 HBM passes
per conv at the 256x256x128 activation size where 35% of the U-Net's FLOPs
live. The whole pre-conv chain, however, is a single per-(batch, channel)
AFFINE + SiLU:

    gn:         (x - m_g) * rsqrt(v_g + eps) * gamma_c + beta_c
    gn o film:  folds the FiLM (1+s_c), b_c into the same (A, B)
    =>          silu(x * A[b,c] + B[b,c])

and the *group* statistics the next gn needs are derivable from per-channel
raw moments (sum, sum of squares) of the conv output. So ONE kernel shape
covers the whole block:

    affine_silu_conv3x3(x, A, B, w, bias, add=None, want_moments=False)
      = conv3x3(silu(x * A + B)) + bias (+ add)   [+ per-channel moments]

computed as 9 shifted (TH*W, Cin) x (Cin, Cout) MXU matmuls over row-tiles
with a 1-row halo (manual DMA — BlockSpec blocks cannot overlap), the
prologue on the VPU in-VMEM, and moments accumulated from the fp32
accumulator before the bf16 store. HBM traffic per conv: read x + write y
(2 passes) vs XLA's ~6.

The backward pass falls back to XLA via ``jax.custom_vjp`` over the jnp
reference (`_reference`), which is also the CPU/interpret-mode oracle
(tests/test_pallas_resblock.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16MB/core VMEM


def _pick_th(H: int, W: int, cin: int, cout: int, itemsize: int) -> int:
    """Largest row-tile TH dividing H such that scratch + acc + out fit.

    TH=4/2 entries exist for the huge-spatial regime (W=1024 @128ch needs
    TH=4 to fit; TH=8 was ~19MB and killed the Mosaic compile) — TH is the
    untiled leading dim, so small values don't break the (8, 128) layout.
    Channel counts are rounded up to the 128-lane tile: a 3-channel head/in
    conv occupies full 128-lane vregs in VMEM regardless of its true width.
    """
    ci = -(-cin // 128) * 128
    co = -(-cout // 128) * 128
    for th in (128, 64, 32, 16, 8, 4, 2):
        if H % th:
            continue
        scratch = (th + 2) * W * ci * itemsize
        act32 = 2 * (th + 2) * W * ci * 4  # fp32 act + one rolled copy
        acc = th * W * co * 4
        out = th * W * co * itemsize
        wts = 9 * ci * co * itemsize
        if scratch + act32 + acc + out + wts <= VMEM_BUDGET:
            return th
    return None  # no fitting tile: caller must keep the XLA path


def _kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, *rest, TH, H, W, cin, cout,
            nH, has_add, want_moments, linear):
    if has_add:
        add_ref, y_ref = rest[0], rest[1]
        outs = rest[2:]
    else:
        add_ref, y_ref = None, rest[0]
        outs = rest[1:]
    mom_ref = outs[0] if want_moments else None
    scratch, sem = outs[-2], outs[-1]

    b = pl.program_id(0)
    i = pl.program_id(1)

    # ---- halo DMA: rows [i*TH - 1, i*TH + TH + 1) of image b into scratch
    # rows, shifted right by one column (cols 0 and W+1 stay pad) -----------
    if nH == 1:
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, H), :, :], scratch.at[pl.ds(1, H), :, :], sem
        )
        cp.start()
        cp.wait()
    else:
        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, TH + 1), :, :],
                scratch.at[pl.ds(1, TH + 1), :, :], sem,
            )
            cp.start()
            cp.wait()

        @pl.when(i == nH - 1)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(H - TH - 1, TH + 1), :, :],
                scratch.at[pl.ds(0, TH + 1), :, :], sem,
            )
            cp.start()
            cp.wait()

        @pl.when(jnp.logical_and(i > 0, i < nH - 1))
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(jnp.maximum(i * TH - 1, 0), TH + 2), :, :],
                scratch.at[pl.ds(0, TH + 2), :, :], sem,
            )
            cp.start()
            cp.wait()

    # ---- prologue: act = silu(x*A + B), zero outside the valid image ------
    x_tile = scratch[...]
    a_vec = a_ref[b, :].astype(jnp.float32)
    b_vec = b_ref[b, :].astype(jnp.float32)
    pre = x_tile.astype(jnp.float32) * a_vec[None, None, :] + b_vec[None, None, :]
    act = pre if linear else pre * jax.nn.sigmoid(pre)
    # Valid-row mask, built 3-D in int32: Mosaic only supports minor-dim
    # broadcasts for 32-bit types, so no bool[:, :, None] here. Columns span
    # exactly the image width; horizontal padding is handled at the shifts.
    rows = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W, 1), 0) + i * TH - 1
    valid = (rows >= 0) & (rows < H)
    act = jnp.where(valid, act, 0.0)  # fp32: pltpu.roll needs 32-bit data

    # ---- 9 shifted matmuls on the MXU --------------------------------------
    # Column shifts via pltpu.roll (slices on the sublane dim must be
    # 8-aligned, so act[:, dx:dx+W] with dx in {1,2} is not lowerable); row
    # shifts are slices on the untiled leading dim. The contraction is a 3-D
    # dot_general over the channel dim — no reshapes, Mosaic maps it to the
    # MXU with the leading dims collapsed.
    dn = (((2,), (0,)), ((), ()))
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (TH + 2, W, 1), 1)
    acc = jnp.zeros((TH, W, cout), jnp.float32)
    for dx in range(3):
        # Column offset dx-1 via circular roll (sublane slices must be
        # 8-aligned, so act[:, dx-1+j] windows are not sliceable); the
        # wrapped column is image padding and gets zeroed. pltpu.roll needs
        # a non-negative shift and 32-bit data (hence fp32 act).
        if dx == 1:
            sh = act
        elif dx == 0:  # left neighbor: shift right by 1, col 0 is padding
            sh = jnp.where(col_ids >= 1, pltpu.roll(act, 1, axis=1), 0.0)
        else:  # right neighbor: shift left by 1, col W-1 is padding
            sh = jnp.where(col_ids < W - 1, pltpu.roll(act, W - 1, axis=1), 0.0)
        cols = sh.astype(x_tile.dtype)
        for dy in range(3):
            acc = acc + jax.lax.dot_general(
                cols[dy : dy + TH], w_ref[3 * dy + dx], dn,
                preferred_element_type=jnp.float32,
            )

    acc = acc + bias_ref[0, :].astype(jnp.float32)[None, None, :]
    if has_add:
        acc = acc + add_ref[0].astype(jnp.float32)

    if want_moments:
        mom_ref[0, 0, 0, :] = jnp.sum(acc, axis=(0, 1))
        mom_ref[0, 0, 1, :] = jnp.sum(acc * acc, axis=(0, 1))

    y_ref[0] = acc.astype(y_ref.dtype)


def _reference(x, A, B, w9, bias, add, linear=False):
    """jnp oracle (and the custom_vjp backward path).

    The conv goes through the space-to-batch fold at fold-gate shapes
    (math-identical, tests/test_spatial_fold.py): anyone differentiating
    through the fused forward then gets the FOLDED dgrad/wgrad — measured
    2.43x over direct XLA at 512px small-batch train — instead of the
    pathological direct tiling. The conv pads the post-silu tensor, so the
    fold's zero edge rows reproduce SAME padding exactly."""
    from .spatial_fold import fold_chunks, fold_halo, unfold

    pre = x.astype(jnp.float32) * A[:, None, None, :] + B[:, None, None, :]
    act = (pre if linear else pre * jax.nn.sigmoid(pre)).astype(x.dtype)
    k = w9.reshape(3, 3, w9.shape[1], w9.shape[2])  # (kh, kw, Cin, Cout)
    chunks = fold_chunks(act.shape)

    def conv(a, hpad):
        return jax.lax.conv_general_dilated(
            a, k, (1, 1), (hpad, (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    if chunks > 1:
        y = unfold(conv(fold_halo(act, chunks, halo=1), (0, 0)), act.shape[0])
    else:
        y = conv(act, (1, 1))
    y = y + bias.astype(jnp.float32)[None, None, None, :]
    if add is not None:
        y = y + add.astype(jnp.float32)
    return y


def _moments_of(y32):
    s = jnp.sum(y32, axis=(1, 2))
    ss = jnp.sum(y32 * y32, axis=(1, 2))
    return jnp.stack([s, ss], axis=1)  # (B, 2, Cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused(x, A, B, w9, bias, add, want_moments, linear=False):
    B_, H, W, cin = x.shape
    cout = w9.shape[2]
    TH = _pick_th(H, W, cin, cout, x.dtype.itemsize)
    if TH is None:
        raise ValueError(
            f"affine_silu_conv3x3: no row tile fits VMEM for shape {x.shape} "
            f"-> {cout}ch (gate with fused_block_gate before calling)")
    nH = H // TH
    has_add = add is not None

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # x: manual halo DMA
        # full (B, C) blocks — Mosaic requires last-two block dims divisible
        # by (8, 128) or equal to the array's; row-indexed in the kernel.
        pl.BlockSpec((B_, cin), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B_, cin), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((9, cin, cout), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, A.astype(jnp.float32), B.astype(jnp.float32), w9,
            bias.reshape(1, cout)]
    if has_add:
        in_specs.append(
            pl.BlockSpec((1, TH, W, cout), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(add)

    out_shape = [jax.ShapeDtypeStruct((B_, H, W, cout), x.dtype)]
    out_specs = [
        pl.BlockSpec((1, TH, W, cout), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if want_moments:
        out_shape.append(jax.ShapeDtypeStruct((B_, nH, 2, cout), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, 2, cout), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _kernel, TH=TH, H=H, W=W, cin=cin, cout=cout, nH=nH,
        has_add=has_add, want_moments=want_moments, linear=linear,
    )
    flops = 2 * 9 * cin * cout * H * W * B_
    res = pl.pallas_call(
        kernel,
        grid=(B_, nH),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=x.size,
        ),
    )(*args)
    if want_moments:
        y, mom = res
        return y, jnp.sum(mom, axis=1)  # (B, 2, Cout)
    return res, None


def _fused_fwd(x, A, B, w9, bias, add, want_moments, linear=False):
    out = _fused(x, A, B, w9, bias, add, want_moments, linear)
    return out, (x, A, B, w9, bias, add)


def _fused_bwd(want_moments, linear, residuals, g):
    x, A, B, w9, bias, add = residuals
    gy, gmom = g

    def ref_fn(x, A, B, w9, bias, add):
        y32 = _reference(x, A, B, w9, bias, add, linear)
        mom = _moments_of(y32) if want_moments else None
        y = y32.astype(x.dtype)
        return y, mom

    has_add = add is not None

    def closed(*diff_args):
        if has_add:
            y, mom = ref_fn(*diff_args)
        else:
            y, mom = ref_fn(*diff_args, None)
        if want_moments:
            return y, mom
        return (y,)

    diff = (x, A, B, w9, bias) + ((add,) if has_add else ())
    cts = (gy, gmom) if want_moments else (gy,)
    grads = jax.vjp(closed, *diff)[1](cts)
    if not has_add:
        grads = grads + (None,)
    return grads


_fused.defvjp(_fused_fwd, _fused_bwd)


def affine_silu_conv3x3(
    x: jax.Array,
    A: jax.Array,
    B: jax.Array,
    w9: jax.Array,
    bias: jax.Array,
    add: Optional[jax.Array] = None,
    want_moments: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """``conv3x3(silu(x*A + B)) + bias (+ add)``, fused on TPU.

    x: (B, H, W, Cin) NHWC; A, B: (B, Cin) per-(batch, channel) affine;
    w9: (9, Cin, Cout) — conv kernel reshaped from (3, 3, Cin, Cout);
    bias: (Cout,); add: optional (B, H, W, Cout) residual.
    Returns (y, moments) where moments is (B, 2, Cout) = [sum, sum-of-squares]
    of the fp32 output per channel (None unless requested).
    """
    return _fused(x, A, B, w9, bias, add, want_moments)


def affine_conv3x3(
    x: jax.Array,
    A: jax.Array,
    B: jax.Array,
    w9: jax.Array,
    bias: jax.Array,
    add: Optional[jax.Array] = None,
    want_moments: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """``conv3x3(x*A + B) + bias (+ add)`` — the NO-activation variant of
    :func:`affine_silu_conv3x3`, for the U-Net boundary convs: the head conv
    consumes GroupNorm output with no activation (reference
    ``models/unet.py:78-79,105`` — GN folds into (A, B)) and the in conv is
    a plain conv (A=1, B=0). Both are HBM-bound at huge spatial sizes where
    XLA's 3-lane tiling runs ~1% MFU (docs/performance.md 1024px section)."""
    return _fused(x, A, B, w9, bias, add, want_moments, True)


def affine_silu_conv3x3_reference(x, A, B, w9, bias, add=None,
                                  want_moments=False, linear=False):
    y32 = _reference(x, A, B, w9, bias, add, linear)
    mom = _moments_of(y32) if want_moments else None
    return y32.astype(x.dtype), mom


# ----------------------------------------------------------- block-level glue
#
# A whole ResBlock (models/blocks.py ResBlock == reference blocks.py:28-44)
# is TWO kernel calls once every per-(batch, channel) affine is folded in:
#
#   A1,B1 = GN1-as-affine(stats(x))          [one XLA reduction pass, or the
#                                             previous kernel's moments]
#   y     = affine_silu_conv3x3(x, A1, B1, w1, bias1, want_moments=True)
#   A2,B2 = GN2∘FiLM-as-affine(moments(y))   [tiny (B,C) math, no HBM pass]
#   out   = affine_silu_conv3x3(y, A2, B2, w2, bias2, add=x)
#
# The FiLM y' = y*(1+s)+b never materializes: GN2's statistics over y' are
# derived from y's raw per-channel moments (E[y'], E[y'^2] are affine images
# of E[y], E[y^2]), and the (1+s) scale composes into A2/B2.

GN_EPS = 1e-5


def gn_affine(x: jax.Array, gamma: jax.Array, beta: jax.Array, groups: int,
              eps: float = GN_EPS) -> Tuple[jax.Array, jax.Array]:
    """Per-(batch, channel) affine (A, B) such that x*A + B == GroupNorm(x)
    with weight ``gamma``/``beta`` — one reduction pass over x."""
    Bn, H, W, C = x.shape
    xg = x.astype(jnp.float32).reshape(Bn, -1, groups, C // groups)
    m = jnp.mean(xg, axis=(1, 3))                      # (B, G)
    v = jnp.mean(jnp.square(xg), axis=(1, 3)) - m * m
    mc = jnp.repeat(m, C // groups, axis=1)            # (B, C)
    vc = jnp.repeat(v, C // groups, axis=1)
    A = gamma[None, :] * jax.lax.rsqrt(vc + eps)
    return A, beta[None, :] - mc * A


def gn_affine_from_moments(
    mom: jax.Array, hw: int, gamma: jax.Array, beta: jax.Array, groups: int,
    film: Optional[Tuple[jax.Array, jax.Array]] = None, eps: float = GN_EPS,
) -> Tuple[jax.Array, jax.Array]:
    """GN affine for an input y given its per-channel raw moments
    ``mom`` (B, 2, C) = [sum, sum-of-squares over H*W], optionally with a
    FiLM ``y' = y*(1+s) + b`` folded in front of the normalization: the
    returned (A, B) satisfy y*A + B == GN(FiLM(y))."""
    s, ss = mom[:, 0], mom[:, 1]
    mean_y = s / hw
    ey2 = ss / hw
    if film is not None:
        f1 = 1.0 + film[0]
        fb = film[1]
        mean_yp = f1 * mean_y + fb
        ey2p = f1 * f1 * ey2 + 2.0 * f1 * fb * mean_y + fb * fb
    else:
        f1 = jnp.ones_like(mean_y)
        fb = jnp.zeros_like(mean_y)
        mean_yp, ey2p = mean_y, ey2
    Bn, C = mean_y.shape
    g = groups
    mg = jnp.mean(mean_yp.reshape(Bn, g, C // g), axis=2)
    eg = jnp.mean(ey2p.reshape(Bn, g, C // g), axis=2)
    vg = jnp.maximum(eg - mg * mg, 0.0)  # raw-moment form can go -eps
    mgc = jnp.repeat(mg, C // g, axis=1)
    vgc = jnp.repeat(vg, C // g, axis=1)
    inv = gamma[None, :] * jax.lax.rsqrt(vgc + eps)
    return f1 * inv, (fb - mgc) * inv + beta[None, :]


def fused_block_gate(shape: Tuple[int, ...], itemsize: int = 2,
                     backend: Optional[str] = None) -> bool:
    """Auto-gate for the two-kernel fused ResBlock — currently returns
    False everywhere: the kernel is at PARITY with XLA today, not a win.

    History (docs/performance.md "1024px re-measured"): the kernel was
    built when XLA's direct conv tiling collapsed at small-batch huge-
    spatial shapes (ResBlock @1024x128 B=2: 42.6 ms direct / 22.5 folded
    vs 15.7 fused — a 1.4-1.9x win, round-4 probes). Re-probed this round
    on the SAME shapes, XLA's direct conv now runs 39-70% MFU and all
    three forms are within noise (fused 15.68 / folded 15.27 / direct
    16.11 ms @1024x128 B=2; 2.28/2.22/2.23 @256x256) — the terminal's
    compiler stack improved between rounds, and per the keep-only-if-it-
    beats-XLA rule the default dispatch stays on the XLA/fold paths.
    The kernel remains force-able (``fused_pallas=True``) and parity-
    tested so the A/B is one flag if a future environment regresses.
    """
    del shape, itemsize, backend
    return False  # parity, not a win, in the current environment (r5)


def fused_boundary_gate(shape: Tuple[int, ...], cout: int, itemsize: int = 2,
                        backend: Optional[str] = None) -> bool:
    """Gate for the U-Net head conv (GN + base->3) through
    :func:`affine_conv3x3` — currently returns False everywhere (parity
    with the shipped fold path in the current environment, see the
    default-OFF note at the bottom); the structural Mosaic constraints are
    still enforced first so a True-forcing caller gets a clear answer for
    shapes that can never compile."""
    if len(shape) != 4:
        return False
    Bn, H, W, C = shape
    try:
        if (backend or jax.default_backend()) != "tpu":
            return False
    except RuntimeError:
        return False
    # Mosaic constraint (measured on chip, probe_boundary_conv.py r5): the
    # kernel's manual halo DMA slices the HBM input per (batch, row-window),
    # and memref slices require the lane (minor) dim aligned to the 128
    # tile. A 3-lane image input therefore can NOT take this path (the
    # in conv stays on XLA); the head conv's 128-lane input is fine — its
    # 3-lane OUTPUT rides a regular BlockSpec, which allows full-dim blocks.
    if C % 128:
        return False
    if H % 2 or W % 128 or _pick_th(H, W, C, cout, itemsize) is None:
        return False
    # Default OFF (r5): the fused head measures 8.09 ms vs 15.76 for XLA
    # GN+direct-conv at 1024px B=2, but the SHIPPED head path is the
    # spatial-fold form, and the whole-net A/B (scripts/probe_1024_e2e_ab)
    # shows fused == folded in context — parity, not a win, so the gate
    # follows the keep-only-if-it-beats-XLA rule. Force with
    # ``fused_pallas=True`` (parity-tested; a 2x standby if the fold path
    # is ever retired or the environment regresses).
    del Bn
    return False
