"""Training losses (layer L5), per-sample so padded batches average exactly.

Mirrors the reference loss surface (``train/diffusion_train.py:123-136``):
eps-MSE + recon_w * L1(x0_pred, x0) + tv_w * TV(x0_pred) + clip_w * CLIP-align.

The CLIP-alignment term replicates a reference quirk **faithfully by
default**: the reference computes the CLIP embedding of the prediction inside
``torch.no_grad()`` (``diffusion_train.py:131-135``), so the term is constant
w.r.t. parameters — it shifts the reported loss but contributes **zero
gradient**. Here that is ``jax.lax.stop_gradient`` around the whole term; set
``clip_align_grad=True`` on the trainer to get the (fixed) differentiable
version instead.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def weighted_mean(per_sample: jax.Array, weight: jax.Array) -> jax.Array:
    """Average over real (non-padding) samples only."""
    return jnp.sum(per_sample * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def eps_mse(eps_hat: jax.Array, noise: jax.Array) -> jax.Array:
    """(B,) per-sample MSE over pixels."""
    return jnp.mean(jnp.square(eps_hat - noise), axis=(1, 2, 3))


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))


def total_variation(x: jax.Array) -> jax.Array:
    """Per-sample anisotropic TV on NHWC (reference ``train/diffusion_train.py:60-63``)."""
    tv_h = jnp.mean(jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]), axis=(1, 2, 3))
    tv_w = jnp.mean(jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]), axis=(1, 2, 3))
    return tv_h + tv_w


def clip_alignment(
    x0_pred: jax.Array,
    z: jax.Array,
    clip_embed_fn: Callable[[jax.Array], jax.Array],
    stop_grad: bool = True,
) -> jax.Array:
    """(B,) ``1 - cos(CLIP(x0_pred), z)``.

    ``clip_embed_fn`` maps ``[-1, 1]`` NHWC images to L2-normalized embeddings.
    The reference feeds raw ``[-1,1]`` pixels bilinear-resized to 224 with no
    CLIP mean/std normalization (``diffusion_train.py:132``) — the embed fn
    passed by the trainer reproduces that.
    """
    def term(xp: jax.Array) -> jax.Array:
        y = clip_embed_fn(xp)
        y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
        zn = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        return 1.0 - jnp.sum(y * zn, axis=-1)

    if stop_grad:
        return jax.lax.stop_gradient(term(x0_pred))
    return term(x0_pred)
