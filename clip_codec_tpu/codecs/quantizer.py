"""Per-channel affine uint8 quantizer (layer L1) as pure, jittable JAX ops.

One implementation unifies the reference's two copies (SURVEY.md §2.1):

* the torch class ``PerChannelAffineQuantizer`` (``codecs/quantizer.py:13-40``,
  ``eps=1e-8``, denominator ``2**bits - 1``), and
* the numpy ``quantise_vectors`` in the DINO CLI
  (``cli/encode_images_dino.py:45-53``, ``eps=1e-6``, denominator ``255.0``).

Math (asymmetric affine, float zero-offset — not an integer zero-point):

    scale = max(xmax - xmin, eps) / (2**bits - 1)     per channel, fit on data
    zero  = xmin
    q     = clip(round((x - zero) / scale), 0, 2**bits - 1)   -> uint8
    x̂     = q * scale + zero

Rounding is round-half-to-even in torch, numpy and XLA alike, so the quantized
integers agree bit-for-bit across backends — which is what makes the ``.clp``
bitstreams byte-identical (zstd framing is deterministic given equal bytes).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _minmax(X: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return jnp.min(X, axis=0), jnp.max(X, axis=0)


def fit_affine(X: jax.Array, num_bits: int = 8, eps: float = 1e-8) -> Tuple[jax.Array, jax.Array]:
    """Fit per-channel ``(scale, zero)`` over a dataset ``X`` of shape (N, D).

    The O(N*D) min/max reduction runs on device; the final O(D) scale
    arithmetic runs host-side in IEEE fp32. This is deliberate: XLA rewrites
    divide-by-constant into a reciprocal multiply, which lands 1 ulp off
    IEEE division in ~74% of channels (measured, tests/test_clp_bitwise.py)
    and can flip rounding-tie integers vs the reference
    (``codecs/quantizer.py:25``) — and TPU/CPU backends would each do it
    differently. A codec's codebook must be deterministic across backends,
    so the division is pinned to host IEEE semantics.
    """
    xmin, xmax = _minmax(jnp.asarray(X, jnp.float32))
    xmin = np.asarray(xmin, np.float32)
    rng_ = np.maximum(np.asarray(xmax, np.float32) - xmin, np.float32(eps))
    scale = rng_ / np.float32(2**num_bits - 1)
    return jnp.asarray(scale), jnp.asarray(xmin)


@partial(jax.jit, static_argnames=("num_bits",))
def quantize(x: jax.Array, scale: jax.Array, zero: jax.Array, num_bits: int = 8) -> jax.Array:
    """Encode float vectors to uint8 codes; broadcasts over leading dims."""
    q = jnp.round((x - zero) / scale)
    q = jnp.clip(q, 0, 2**num_bits - 1)
    return q.astype(jnp.uint8)


@jax.jit
def dequantize(q: jax.Array, scale: jax.Array, zero: jax.Array) -> jax.Array:
    """Decode uint8 codes back to float32 vectors."""
    return q.astype(jnp.float32) * scale + zero


@jax.jit
def dequantize_l2norm(q: jax.Array, scale: jax.Array, zero: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Fused dequantize + L2-renormalize — the decode path every consumer uses
    (reference re-implements this inline at e.g. ``train/diffusion_train.py:53-55``)."""
    x = q.astype(jnp.float32) * scale + zero
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def dequantize_l2norm_host(q: np.ndarray, scale: np.ndarray, zero: np.ndarray,
                           eps: float = 1e-9) -> np.ndarray:
    """Pure-numpy :func:`dequantize_l2norm` — for serving/CLI hot paths where
    a tiny jitted dispatch costs ~35 ms of tunnel latency (CLAUDE.md). Same
    fp32 math; used by ``ClipCodec.decode_embeddings_host`` and the
    ``search_text --query_clp`` image-query path."""
    x = np.asarray(q).astype(np.float32) * np.asarray(scale) + np.asarray(zero)
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, eps)


@dataclass
class PerChannelAffineQuantizer:
    """Stateful wrapper mirroring the reference class API (fit/encode/decode)."""

    num_bits: int = 8
    eps: float = 1e-8
    scale: np.ndarray | None = None
    zero: np.ndarray | None = None

    def fit(self, X) -> "PerChannelAffineQuantizer":
        scale, zero = fit_affine(jnp.asarray(X, dtype=jnp.float32), self.num_bits, self.eps)
        self.scale = np.asarray(scale)
        self.zero = np.asarray(zero)
        return self

    def _check(self) -> None:
        if self.scale is None or self.zero is None:
            raise RuntimeError("Quantizer has not been fitted.")

    def encode(self, x) -> np.ndarray:
        self._check()
        q = quantize(jnp.asarray(x, dtype=jnp.float32), jnp.asarray(self.scale), jnp.asarray(self.zero), self.num_bits)
        return np.asarray(q)

    def decode(self, q) -> np.ndarray:
        self._check()
        x = dequantize(jnp.asarray(q), jnp.asarray(self.scale), jnp.asarray(self.zero))
        return np.asarray(x)
