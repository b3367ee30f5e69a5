"""Phase-decomposed nearest-2x-upsample + 3x3 conv (the SD VAE/UNet
upsampler, ``models/sd/layers.py Upsample2D``).

XLA cannot fuse ``jax.image.resize(nearest, 2x)`` into the conv that
follows: it materializes the 4x-pixel tensor to HBM and runs a 9-tap conv
over it. But nearest duplication makes adjacent taps hit the SAME source
pixel, so the composite collapses exactly into FOUR 2x2 convs on the
ORIGINAL tensor — one per output phase (dr, dc):

    y[2i+dr, 2j+dc] = sum_{u,v} K^{dr,dc}[u, v] * x[i - (1-dr) + u, j - (1-dc) + v]
    K^{dr=0} rows  = [w0, w1 + w2]   (taps 2i-1 -> x[i-1]; 2i, 2i+1 -> x[i])
    K^{dr=1} rows  = [w0 + w1, w2]   (taps 2i, 2i+1 -> x[i]; 2i+2 -> x[i+1])
    (same collapse along columns)

Identical math (kernel taps pre-added in fp32; boundary zeros match SAME
padding — pinned exactly in tests/test_upsample.py), 4/9 of the conv FLOPs,
and the 4x tensor never exists — the phases interleave straight into the
output. Measured on v5e at the SD-VAE decode shapes (bench_vae_profile.py):
the materialized form runs at MFU ~0.51-0.55 per upsample.

Reference path this replaces: diffusers ``Upsample2D`` (interpolate +
conv) inside the SD decoder the reference drives via
``/root/reference/src/clip_feature_codec/models/sd_decoder.py:39-42``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["nearest_up_conv"]


def nearest_up_conv(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """``conv3x3(nearest_2x(x)) [+ bias]`` without materializing the 2x tensor.

    x: (B, H, W, Cin) NHWC; kernel: (3, 3, Cin, Cout) HWIO; returns
    (B, 2H, 2W, Cout) in x.dtype (fp32 accumulation inside the convs)."""
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    kf = kernel.astype(jnp.float32)
    # collapse rows for each output-row phase: (2, 3, Cin, Cout)
    rows = (
        jnp.stack([kf[0], kf[1] + kf[2]]),       # dr = 0
        jnp.stack([kf[0] + kf[1], kf[2]]),       # dr = 1
    )
    ys = []
    for dr in (0, 1):
        k2 = rows[dr]
        for dc in (0, 1):
            if dc == 0:
                kc = jnp.stack([k2[:, 0], k2[:, 1] + k2[:, 2]], axis=1)
            else:
                kc = jnp.stack([k2[:, 0] + k2[:, 1], k2[:, 2]], axis=1)
            pad = (((1, 0) if dr == 0 else (0, 1)), ((1, 0) if dc == 0 else (0, 1)))
            y = jax.lax.conv_general_dilated(
                x, kc.astype(x.dtype), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            ys.append(y)
    # (4, B, H, W, Cout) -> out[b, 2i+dr, 2j+dc, c] = ys[2*dr+dc][b, i, j, c]
    y = jnp.stack(ys).reshape(2, 2, B, H, W, Cout)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(B, 2 * H, 2 * W, Cout)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
