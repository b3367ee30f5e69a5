"""Phase-decomposed transposed convolution (k=4, s=2, p=1).

The U-Net's upsamplers are ``ConvTranspose2d(k=4, s=2, p=1)`` (reference
``models/unet.py``). A transposed conv with stride 2 lowers to a regular
conv over a zero-dilated input; if the backend does not split it by output
phase, 3/4 of the MACs multiply zeros. This module computes the SAME
operator as four dense 2x2 convolutions — one per output phase (r, c) =
(row parity, col parity) — followed by an interleave:

    out[2i+1-kh+2a ...]  ->  phase r uses kernel rows {3,1} (r=0, rows pad
    (1,0)) or {2,0} (r=1, rows pad (0,1)); likewise for columns.

Exactness (not an approximation) is asserted against ``nn.ConvTranspose``
in tests/test_models.py; whether it is *faster* is measured on chip by
bench_profile.py before it is wired into the model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# per output-row-phase: (kernel row taps [a=0, a=1], row padding (lo, hi))
_ROW_TAPS = (((3, 1), (1, 0)), ((2, 0), (0, 1)))


def conv_transpose_k4s2(x: jax.Array, kernel: jax.Array, bias: jax.Array | None) -> jax.Array:
    """x: (B, H, W, Cin); kernel: (4, 4, Cout, Cin) — the flax
    ``ConvTranspose(transpose_kernel=True)`` parameter layout; bias: (Cout,).
    Returns (B, 2H, 2W, Cout), numerically identical to the flax/torch op.
    """
    B, H, W, _ = x.shape
    cout = kernel.shape[2]
    k_hwio = kernel.astype(x.dtype).transpose(0, 1, 3, 2)  # (kh, kw, Cin, Cout)

    phases = []
    for (rt, rpad) in _ROW_TAPS:
        row = []
        for (ct, cpad) in _ROW_TAPS:
            k2 = jnp.stack(
                [jnp.stack([k_hwio[a, b] for b in ct], axis=0) for a in rt], axis=0
            )  # (2, 2, Cin, Cout)
            y = lax.conv_general_dilated(
                x, k2, window_strides=(1, 1), padding=(rpad, cpad),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype,
            )
            row.append(y)
        phases.append(row)

    u = jnp.stack(phases[0], axis=3)  # (B, H, W, 2, Cout)   col phases
    v = jnp.stack(phases[1], axis=3)
    y = jnp.stack([u, v], axis=2)     # (B, H, 2, W, 2, Cout) row phases
    y = y.reshape(B, 2 * H, 2 * W, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose_k4s2_onegemm(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None
) -> jax.Array:
    """Same operator as :func:`conv_transpose_k4s2`, lowered as ONE 2x2 conv
    with ``4*Cout`` output channels instead of four separate 2x2 convs.

    The per-phase paddings (1,0)/(0,1) become shifted output slices of a
    single VALID conv over the once-(1,1)-padded input: with padded height
    ``H+2`` the conv yields ``H+1`` rows; row-phase 0 reads rows ``0:H``,
    row-phase 1 reads rows ``1:H+1`` (same for columns). One conv keeps the
    MAC count identical (up to the +1-row/col border) but quadruples the
    GEMM's output-channel width — the lever for the ``Cout=128`` upsampler
    shapes where the four narrow phase GEMMs under-fill the MXU lanes
    (probe: scripts/probe_upsampler.py).
    """
    B, H, W, _ = x.shape
    cout = kernel.shape[2]
    k_hwio = kernel.astype(x.dtype).transpose(0, 1, 3, 2)  # (kh, kw, Cin, Cout)

    # (2, 2, Cin, 4*Cout): phase order (r, c) = (0,0), (0,1), (1,0), (1,1)
    blocks = []
    for (rt, _rpad) in _ROW_TAPS:
        for (ct, _cpad) in _ROW_TAPS:
            blocks.append(jnp.stack(
                [jnp.stack([k_hwio[a, b] for b in ct], axis=0) for a in rt],
                axis=0,
            ))
    k_all = jnp.concatenate(blocks, axis=-1)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    yf = lax.conv_general_dilated(
        xp, k_all, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # (B, H+1, W+1, 4*Cout)

    p00 = yf[:, :H, :W, 0 * cout:1 * cout]
    p01 = yf[:, :H, 1:, 1 * cout:2 * cout]
    p10 = yf[:, 1:, :W, 2 * cout:3 * cout]
    p11 = yf[:, 1:, 1:, 3 * cout:4 * cout]
    u = jnp.stack([p00, p01], axis=3)  # (B, H, W, 2, Cout)  col phases, row 0
    v = jnp.stack([p10, p11], axis=3)
    y = jnp.stack([u, v], axis=2)      # (B, H, 2, W, 2, Cout)
    y = y.reshape(B, 2 * H, 2 * W, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
