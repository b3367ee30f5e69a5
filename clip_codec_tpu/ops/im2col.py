"""3x3 conv as an im2col GEMM — the thin-channel boundary-conv fix.

XLA's direct convolution with cin=3 wastes 125 of 128 MXU lanes; laying the
nine taps out as columns first turns the op into a dense
``(B*H*W, 9*cin) @ (9*cin, cout)`` matmul whose contraction carries 27
useful lanes instead of 3. Measured on chip (r5): with the FULL output
consumed (scripts/probe_inconv_honest.py) the 3->128 in conv at 1024px B=2
is 2.2 ms direct vs 1.2 ms im2col — a real ~1.8x standalone win, though
only ~1 ms of a ~119 ms UNet forward (whole-net A/B shows no measurable
e2e delta). An earlier probe that fed back a 3-channel slice of the output
measured 14.9/3.6 ms — a consumer-shape artifact, kept here as a warning;
the channel-padding alternative (cin 3 -> 32) measured worse than direct
in both probes.

Unlike the fused Pallas boundary kernel, this form has no Mosaic lane-
alignment constraint (it never DMA-slices a thin HBM dim), is freely
differentiable (pad/slice/concat/dot all have clean transposes), and is
GSPMD-partitionable for the spatially-sharded paths.

The reference runs this conv inside ``CLIPCondUNet``
(``models/unet.py:59``: the first 3->base conv); the rewrite is
math-identical (SAME zero padding, fp32 accumulation) and shares nn.Conv's
parameter tree via ``_ConvParams``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def conv3x3_im2col(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """``conv3x3(x, kernel) + bias`` with SAME padding, as an im2col GEMM.

    x: (B, H, W, cin) NHWC; kernel: (3, 3, cin, cout); bias: (cout,).
    Returns (B, H, W, cout) in x.dtype, accumulated in fp32 — bit-matching
    ``lax.conv_general_dilated(..., preferred_element_type=f32)`` up to the
    contraction ORDER (9*cin-lane dot vs the conv's tap loop; <=1 ulp of
    the operand dtype, pinned by tests/test_im2col.py).
    """
    B, H, W, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)  # (B, H, W, 9*cin)
    y = jax.lax.dot_general(
        patches.reshape(B * H * W, 9 * cin),
        kernel.reshape(9 * cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + bias.astype(jnp.float32)
    return y.reshape(B, H, W, cout).astype(x.dtype)


def im2col_gate(shape: Tuple[int, ...], backend: Optional[str] = None) -> bool:
    """Measured-win regime for the boundary im2col form: the huge-spatial
    shapes where XLA's thin-channel conv tiling collapses. Matches the
    fused-boundary/fold spatial rule so the proven headline program
    (256px B=16) is untouched (gate resolves at trace time)."""
    if len(shape) != 4:
        return False
    B, H, W, C = shape
    try:
        if (backend or jax.default_backend()) != "tpu":
            return False
    except RuntimeError:
        return False
    if C > 8:  # thin-channel pathology only; wide convs tile fine direct
        return False
    m = min(H, W)
    return m >= 1024 or (m >= 512 and B <= 4)
