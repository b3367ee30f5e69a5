"""Direct-decoder inference helper (layer L5).

Parity counterpart of ``train/train_decoder.py:24-35``: read a ``.clp``
bitstream, dequantize via the store's ``codec_meta.npz``, L2-normalize, run a
direct decoder, and return a PIL image. The reference file also re-implements
``l2_normalize_np`` / ``total_variation`` (duplicates unified here into
:mod:`clip_codec_tpu.io.store` / :mod:`clip_codec_tpu.train.losses`).

The reference ships **no training loop** for the direct decoders (SURVEY.md
§2.1); :func:`train_direct_decoder` adds the obvious one (L1 + TV) as an
upgrade, clearly marked as beyond-reference.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..io.bitstream import read_bitstream
from ..io.store import l2_normalize_np

PathLike = Union[str, Path]


def decode_embedding(bit_path: PathLike, store_dir: PathLike) -> np.ndarray:
    """.clp -> dequantized, L2-normalized (1, D) float32 embedding."""
    meta = np.load(Path(store_dir) / "codec_meta.npz")
    scale = meta["scale"].astype("float32")
    zero = meta["zero"].astype("float32")
    q = read_bitstream(bit_path)
    z = q.astype(np.float32) * scale + zero
    return l2_normalize_np(z[None, :]).astype(np.float32)


def to_pil(img_m11: np.ndarray) -> Image.Image:
    """(H, W, 3) [-1,1] float -> PIL uint8."""
    arr = np.clip(np.asarray(img_m11), -1.0, 1.0)
    return Image.fromarray(((arr + 1.0) * 127.5).astype(np.uint8))


def reconstruct_image_from_bitstream(
    bit_path: PathLike,
    store_dir: PathLike,
    decoder_apply: Callable[[jax.Array], jax.Array],
    out_size: int = 64,
) -> Image.Image:
    """Decode a bitstream and run a direct decoder ``z -> image``.

    ``decoder_apply`` is a bound apply fn, e.g.
    ``lambda z: CLIPCondDecoder(...).apply(params, z)``; ``out_size`` is
    accepted for signature parity (the decoder's own config controls size).
    """
    del out_size
    z = jnp.asarray(decode_embedding(bit_path, store_dir))
    y = decoder_apply(z)
    return to_pil(np.asarray(y[0]))


def train_direct_decoder(
    store_dir: PathLike,
    decoder,
    out_size: int = 64,
    epochs: int = 10,
    batch_size: int = 16,
    lr: float = 2e-4,
    tv_w: float = 1e-4,
    seed: int = 0,
    save_path: Optional[PathLike] = None,
):
    """[Beyond-reference] Minimal L1+TV training loop for the direct decoders."""
    import optax

    from ..utils.checkpoint import save_params
    from .data import StoreData
    from .losses import l1, total_variation, weighted_mean

    data = StoreData(store_dir, out_size=out_size)
    tx = optax.adamw(lr)
    params = decoder.init(jax.random.PRNGKey(seed), jnp.zeros((1, data.z_dim), jnp.float32))["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x0, z, w):
        def loss_fn(p):
            y = decoder.apply({"params": p}, z).astype(jnp.float32)
            per = l1(y, x0) + tv_w * total_variation(y)
            return weighted_mean(per, w)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    rng = np.random.default_rng(seed)
    last = None
    for _ in range(epochs):
        for batch in data.epoch(batch_size, rng):
            params, opt_state, last = step(
                params, opt_state, jnp.asarray(batch.x0), jnp.asarray(batch.z), jnp.asarray(batch.weight)
            )
    if save_path is not None:
        save_params(save_path, params)
    return params, (float(last) if last is not None else None)
