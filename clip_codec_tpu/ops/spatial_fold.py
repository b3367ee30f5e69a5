"""Space-to-batch folding for huge-spatial / low-batch ResBlocks.

Measured motivation (docs/performance.md, 1024px row): XLA's TPU conv at
B=2 @1024x1024x128 runs 28.8% MFU while the SAME total work reshaped to
B=8 @256 runs 57-65% — the conv row-tiling under-parallelizes at tiny batch.
Folding H-chunks into the batch axis recovers the fast regime. A naive
per-conv fold loses the win to the halo-copy (measured 9.75 vs 10.9 ms);
this module folds ONCE PER RESBLOCK with a 2-row halo that the block's two
VALID-in-H convs consume exactly (2 -> 1 -> 0 rows), so the copy is
amortized over both convs and the whole elementwise chain.

Semantics notes (each load-bearing, tested in tests/test_spatial_fold.py):

* Interior halo rows are duplicates of neighbor-chunk rows; elementwise ops
  (normalize/SiLU/FiLM) keep duplicates consistent automatically.
* The reference conv is SAME: it zero-pads the *post-norm* tensor. Folding
  pads the RAW input, so image-edge halo rows are re-zeroed immediately
  before each conv (`edge_mask`) — after every elementwise op that would
  have turned 0 into non-0.
* GroupNorm stats must be per-IMAGE over the un-duplicated spatial extent:
  the first GN takes stats from the unfolded input; the second computes
  masked stats over each chunk's valid rows only.

Reference path this accelerates: ``models/blocks.py:28-44`` ResBlocks at
the full-resolution stages of ``models/unet.py:42-106``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_FOLD_ENABLED = True  # process default for fold_spatial="auto" modules


def set_fold_spatial(enabled: bool) -> None:
    """Process-wide switch for the "auto" gate (A/B benchmarking; the
    folded path is math-identical so there is no quality reason to disable)."""
    global _FOLD_ENABLED
    _FOLD_ENABLED = bool(enabled)


def fold_chunks(shape: Tuple[int, ...], min_h: int = 256, max_b: int = 4,
                target_rows: int = 8) -> int:
    """Auto gate: number of H-chunks to fold into batch (1 = don't fold).

    Measured on chip (docs/performance.md 1024px row): the win needs
    EFFECTIVE batch B*chunks >= 8 (eff 8/12/16 all ~28% MFU at 1024x128 vs
    14.7% direct; eff 4 and 6 REGRESS to 10.8%), and B=1 is already in
    XLA's good tiling regime (32% direct, folding is noise-level). The same
    pattern holds down the stage shapes: 512x128 B=2 10.2->5.2 ms, 512x256
    B=2 23.1->14.0, 512x128 B=4 21.6->11.5, 256x128 B=2 2.01->0.55 ms
    (19.5 -> 71.6% MFU), 256x128 B=4 5.12->2.52. So: fold only for
    2 <= B <= max_b and H >= 256, rounding the chunk count UP to the next
    divisor of H while keeping chunks of >= 64 rows.
    """
    B, H = shape[0], shape[1]
    if not _FOLD_ENABLED or H < min_h or B < 2 or B > max_b:
        return 1
    f0 = -(-target_rows // B)  # ceil: eff batch must reach target_rows
    for f in range(f0, H // 64 + 1):  # f <= H/64 keeps chunk rows >= 64
        if H % f == 0:
            return f
    return 1


def fold_halo(x: jax.Array, chunks: int, halo: int) -> jax.Array:
    """(B, H, W, C) -> (B*chunks, H/chunks + 2*halo, W, C).

    Image-edge halo rows are zero-filled (masked again post-elementwise by
    :func:`edge_mask`); interior halos duplicate neighbor-chunk rows.
    """
    B, H, W, C = x.shape
    R = H // chunks
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    parts = [
        jax.lax.dynamic_slice_in_dim(xp, k * R, R + 2 * halo, axis=1)
        for k in range(chunks)
    ]
    return jnp.stack(parts, axis=1).reshape(B * chunks, R + 2 * halo, W, C)


def unfold(y: jax.Array, batch: int) -> jax.Array:
    """(B*chunks, R, W, C) -> (B, chunks*R, W, C); valid-rows-only input."""
    BF, R, W, C = y.shape
    return y.reshape(batch, (BF // batch) * R, W, C)


def edge_mask(y: jax.Array, batch: int, halo: int) -> jax.Array:
    """Zero the image-edge halo rows (top `halo` of each image's first chunk,
    bottom `halo` of its last) so the next VALID conv sees the zeros SAME
    padding would have provided. Interior halos are left untouched."""
    BF, Rh, W, C = y.shape
    chunks = BF // batch
    rows = jnp.arange(Rh)
    f = jnp.arange(chunks)
    keep = ((f[:, None] > 0) | (rows[None, :] >= halo)) & (
        (f[:, None] < chunks - 1) | (rows[None, :] < Rh - halo)
    )  # (chunks, Rh); batch-major fold order means tiling over images
    return y * jnp.tile(keep.astype(y.dtype), (batch, 1)).reshape(BF, Rh, 1, 1)


def gn_stats_folded(
    y: jax.Array, batch: int, halo: int, groups: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-image GroupNorm statistics from a folded tensor, over each chunk's
    VALID rows only (excluding the `halo` duplicated/edge rows per side).
    Returns (mean, var) shaped (B*chunks, 1, 1, groups, 1) — repeated per
    chunk, ready to broadcast over the folded group-split layout."""
    BF, Rh, W, C = y.shape
    chunks = BF // batch
    R = Rh - 2 * halo
    y32 = y.astype(jnp.promote_types(y.dtype, jnp.float32))
    valid = y32[:, halo:Rh - halo].reshape(batch, chunks, R, W, groups, C // groups)
    mean = jnp.mean(valid, axis=(1, 2, 3, 5), keepdims=True)  # (B,1,1,1,g,1)
    var = jnp.mean(jnp.square(valid - mean), axis=(1, 2, 3, 5), keepdims=True)
    mean = jnp.repeat(mean.reshape(batch, 1, 1, groups, 1), chunks, axis=0)
    var = jnp.repeat(var.reshape(batch, 1, 1, groups, 1), chunks, axis=0)
    return mean, var


def normalize_silu(
    y: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm normalize + affine + SiLU with externally supplied stats
    (same math as ops.group_norm_silu's XLA path, stats factored out)."""
    B, H, W, C = y.shape
    y32 = y.astype(jnp.promote_types(y.dtype, jnp.float32)).reshape(B, H, W, groups, C // groups)
    z = (y32 - mean) * jax.lax.rsqrt(var + eps)
    z = z.reshape(B, H, W, C) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (z * jax.nn.sigmoid(z)).astype(y.dtype)


def folded_conv_transpose_k4s2(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """``ConvTranspose2d(k=4, s=2, p=1)`` (flax ``transpose_kernel=True``
    layout, H-dim folded): fold with a 1-row halo, run the transposed conv
    with full H padding on each chunk, then keep the interior 2R rows —
    the halo rows supply exactly the cross-chunk taps the direct op reads.
    Zero edge rows reproduce the direct op's implicit zero taps. Returns
    None when the shape is outside the fold gate."""
    B, H, W, C = x.shape
    chunks = fold_chunks(x.shape)
    if chunks == 1:
        return None
    R = H // chunks
    xc = fold_halo(x, chunks, halo=1)  # (B*chunks, R+2, W, C)
    y = jax.lax.conv_transpose(
        xc, kernel, strides=(2, 2), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )  # (B*chunks, 2R+4, 2W, Cout): rows 0..1 and 2R+2..2R+3 belong to halos
    return unfold(y[:, 2:-2], B)
