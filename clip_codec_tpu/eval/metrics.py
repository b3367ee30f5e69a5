"""Reconstruction-quality metrics (layer L6), batched and on-device.

API mirrors the reference (``eval/metrics.py:16-85``): all functions accept
``[-1, 1]`` float arrays shaped (C, H, W) or (H, W, C).

Differences by design (SURVEY.md §2.1 perf hazards fixed):

* SSIM is a native JAX implementation matching skimage's
  ``structural_similarity(data_range=255, channel_axis=-1)`` defaults
  (7x7 uniform window, sample covariance, edge crop) instead of returning
  NaN when skimage is absent;
* LPIPS and CLIP-sim models are **constructed once and reused** — the
  reference re-instantiates both networks on every call
  (``eval/metrics.py:60,68``);
* batched NHWC variants (``psnr_batch``/``ssim_batch``) run the whole store
  in one jit.

LPIPS still returns NaN when no weights are available, mirroring the
reference's lpips-missing behavior (``eval/metrics.py:49-53``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8, truncating like the reference ``_to_uint8``
    (``eval/metrics.py:16-19``: clip then astype, no rounding)."""
    return (((np.asarray(img) + 1.0) * 127.5).clip(0, 255)).astype(np.uint8)


_to_uint8 = to_uint8  # reference-name alias


def _hwc(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        return img.transpose(1, 2, 0)
    return img


# ------------------------------------------------------------------- PSNR

def psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR on uint8-quantized images, 255 peak (``eval/metrics.py:22-29``)."""
    x1 = to_uint8(img1).astype(np.float32)
    x2 = to_uint8(img2).astype(np.float32)
    mse = float(np.mean((x1 - x2) ** 2))
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / np.sqrt(mse)))


@jax.jit
def psnr_batch(a_m11: jax.Array, b_m11: jax.Array) -> jax.Array:
    """(B, H, W, C) pairs -> (B,) PSNR, uint8-quantized semantics on device."""
    qa = jnp.clip((a_m11 + 1.0) * 127.5, 0, 255).astype(jnp.uint8).astype(jnp.float32)
    qb = jnp.clip((b_m11 + 1.0) * 127.5, 0, 255).astype(jnp.uint8).astype(jnp.float32)
    mse = jnp.mean((qa - qb) ** 2, axis=(1, 2, 3))
    psnr = 20.0 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
    # identical images -> inf, matching the scalar reference API (metrics.py:27)
    return jnp.where(mse == 0, jnp.inf, psnr)


# ------------------------------------------------------------------- SSIM

def _uniform_valid(x: jax.Array, win: int) -> jax.Array:
    """(B, H, W, C) -> VALID 2-D uniform filter (matches the interior of
    scipy's uniform_filter, which is all skimage keeps after its edge crop)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, win, win, 1), (1, 1, 1, 1), "VALID"
    )
    return s / (win * win)


@partial(jax.jit, static_argnames=("win", "data_range"))
def ssim_batch(
    a_m11: jax.Array, b_m11: jax.Array, win: int = 7, data_range: float = 255.0
) -> jax.Array:
    """(B, H, W, C) [-1,1] pairs -> (B,) SSIM with skimage default semantics:
    uint8 inputs, 7x7 uniform window, sample covariance (N/(N-1)), K1=0.01,
    K2=0.03, per-channel mean after edge crop."""
    x = jnp.clip((a_m11 + 1.0) * 127.5, 0, 255).astype(jnp.uint8).astype(jnp.float32)
    y = jnp.clip((b_m11 + 1.0) * 127.5, 0, 255).astype(jnp.uint8).astype(jnp.float32)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)
    ux = _uniform_valid(x, win)
    uy = _uniform_valid(y, win)
    uxx = _uniform_valid(x * x, win)
    uyy = _uniform_valid(y * y, win)
    uxy = _uniform_valid(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux * ux + uy * uy + c1) * (vx + vy + c2))
    return jnp.mean(s, axis=(1, 2, 3))


def ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """Scalar API on (C,H,W) or (H,W,C) [-1,1] images."""
    a = _hwc(img1)[None]
    b = _hwc(img2)[None]
    return float(ssim_batch(jnp.asarray(a), jnp.asarray(b))[0])


# ------------------------------------------------------------------- LPIPS

_LPIPS_SINGLETON = None
_LPIPS_TRIED = False


def _default_lpips():
    """Build the LPIPS model once from CLIP_CODEC_LPIPS_WEIGHTS, else None."""
    global _LPIPS_SINGLETON, _LPIPS_TRIED
    if not _LPIPS_TRIED:
        _LPIPS_TRIED = True
        try:
            from .lpips import LPIPSModel

            _LPIPS_SINGLETON = LPIPSModel.from_env()
        except Exception:
            _LPIPS_SINGLETON = None
    return _LPIPS_SINGLETON


def lpips_batch(orig_hwc: np.ndarray, recon_hwc: np.ndarray, lpips_model=None) -> np.ndarray:
    """Batched on-device LPIPS over (B, H, W, C) [-1,1] images -> (B,);
    NaNs when no weights are available. One jitted VGG forward for the whole
    batch — completing SURVEY §3.4's "metrics vmapped over the store" for
    the heaviest metric (the reference re-instantiates the net per image,
    ``eval/metrics.py:60``)."""
    model = lpips_model or _default_lpips()
    if model is None:
        return np.full((orig_hwc.shape[0],), np.nan, np.float32)
    import jax.numpy as jnp

    return np.asarray(model.distance(jnp.asarray(orig_hwc), jnp.asarray(recon_hwc)))


def lpips_distance(img1: np.ndarray, img2: np.ndarray, lpips_model=None, device: str = "cpu") -> float:
    """LPIPS (VGG backbone); NaN when no weights are available — mirroring the
    reference's lpips-missing fallback (``eval/metrics.py:49-53``)."""
    del device  # reference-signature parity; JAX owns placement
    model = lpips_model or _default_lpips()
    if model is None:
        return float("nan")
    a = _hwc(img1)[None]
    b = _hwc(img2)[None]
    return float(model.distance(jnp.asarray(a), jnp.asarray(b))[0])


# ------------------------------------------------------------- CLIP similarity

_CLIP_SINGLETON = None
_CLIP_TRIED = False


def _default_clip_encoder():
    global _CLIP_SINGLETON, _CLIP_TRIED
    if not _CLIP_TRIED:
        _CLIP_TRIED = True
        try:
            from ..encoders import ClipEncoder

            _CLIP_SINGLETON = ClipEncoder()
        except Exception:
            _CLIP_SINGLETON = None
    return _CLIP_SINGLETON


def clip_similarity_batch(orig_hwc: np.ndarray, recon_hwc: np.ndarray, encoder=None) -> np.ndarray:
    """Batched CLIP cosine similarity over (B, H, W, C) [-1,1] pairs -> (B,).

    Preprocessing keeps the reference's uint8-PIL semantics per image on the
    host (``eval/metrics.py:65-85``: full CLIP preprocess incl. BICUBIC +
    center crop); the two ViT forwards run as ONE device batch each instead
    of one model call per image."""
    enc = encoder or _default_clip_encoder()
    if enc is None:
        return np.full((orig_hwc.shape[0],), np.nan, np.float32)
    from PIL import Image

    from ..encoders.clip import preprocess_pil_u8

    def prep(batch):
        # uint8 over the link; the encoder LUT-normalizes on device
        # (bit-identical to host preprocess_pil)
        return np.stack([
            preprocess_pil_u8(Image.fromarray(to_uint8(img)), enc.cfg.image_size)
            for img in batch
        ])

    f1 = enc.encode_image_array(prep(orig_hwc))
    f2 = enc.encode_image_array(prep(recon_hwc))
    return np.sum(f1 * f2, axis=-1)


def clip_similarity(img1: np.ndarray, img2: np.ndarray, encoder=None, device: str = "cpu") -> float:
    """Cosine similarity of CLIP embeddings, full CLIP preprocess on the
    uint8 images (``eval/metrics.py:65-85``). NaN when CLIP weights are
    unavailable (the reference would crash importing open_clip; we degrade
    like its other optional metrics)."""
    del device
    enc = encoder or _default_clip_encoder()
    if enc is None:
        return float("nan")
    from PIL import Image

    from ..encoders.clip import preprocess_pil_u8

    def embed(img):
        pil = Image.fromarray(to_uint8(_hwc(img)))
        x = preprocess_pil_u8(pil, enc.cfg.image_size)[None]
        return enc.encode_image_array(x)[0]

    f1, f2 = embed(img1), embed(img2)
    return float(np.sum(f1 * f2))
