"""High-level encoder API (layer L2): images/text -> L2-normalized embeddings.

Pretrained weights are NOT bundled (zero-egress build). Provide converted
checkpoints via arguments or environment variables:

* ``CLIP_CODEC_CLIP_WEIGHTS`` — CLIP ViT-B/32 checkpoint (HF ``CLIPModel``
  ``.bin``/``.safetensors`` or OpenAI/open_clip ``.pt``; auto-detected), and
  ``CLIP_BPE_PATH`` for the text tokenizer merges;
* ``CLIP_CODEC_DINO_WEIGHTS`` — HF ``Dinov2Model`` checkpoint.

Missing weights raise a friendly RuntimeError, mirroring how the reference
gates its optional heavy deps (``models/sd_decoder.py:6-9``).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from .clip import CLIPConfig, CLIPModel, VIT_B_32, preprocess_pil, preprocess_pil_u8
from .dino import DINOV2_BASE, DinoConfig, DinoV2, convert_dino_hf, preprocess_dino
from .tokenizer import CLIPTokenizer

__all__ = [
    "CLIPConfig", "CLIPModel", "VIT_B_32", "preprocess_pil", "preprocess_pil_u8",
    "DinoConfig", "DinoV2", "DINOV2_BASE", "preprocess_dino",
    "CLIPTokenizer", "ClipEncoder", "DinoEncoder",
]


def _require(path: Optional[str], env: str, what: str) -> Path:
    path = path or os.environ.get(env)
    if not path or not Path(path).exists():
        raise RuntimeError(
            f"{what} weights not found. Convert a pretrained checkpoint and set "
            f"{env}=<path> (see clip_codec_tpu/weights/)."
        )
    return Path(path)


def _batched_encode(
    paths: Sequence[str], preprocess, embed, batch_size: int, mesh, dim: int,
) -> Tuple[np.ndarray, List[str]]:
    """Shared file->embedding batching loop for both encoders: fixed-shape
    padded device batches (one compiled program per batch size), corrupt
    files silently skipped (reference ``cli/encode_images.py:42-43``).
    ``preprocess(path) -> (H, W, C) array``; ``embed(pixels) -> (B, dim)``.
    Returns (Z fp32, kept_paths)."""
    from ..utils.batching import pad_rows

    if mesh is not None:  # padded batch must split evenly over chips
        n_data = mesh.shape["data"]
        batch_size = -(-batch_size // n_data) * n_data
    zs: List[np.ndarray] = []
    kept: List[str] = []
    batch: List[np.ndarray] = []
    bpaths: List[str] = []

    def flush():
        if not batch:
            return
        x = np.stack(batch)
        n = x.shape[0]
        zs.append(np.asarray(embed(jnp.asarray(pad_rows(x, batch_size))))[:n])
        kept.extend(bpaths)
        batch.clear()
        bpaths.clear()

    for p in paths:
        try:
            batch.append(preprocess(p))
            bpaths.append(str(p))
        except Exception:
            continue
        if len(batch) == batch_size:
            flush()
    flush()
    if not zs:
        return np.zeros((0, dim), dtype=np.float32), []
    return np.concatenate(zs).astype(np.float32), kept


class ClipEncoder:
    """CLIP ViT-B/32 encode path: batched bf16 image encode + text encode,
    both emitting L2-normalized fp32 embeddings (the reference's
    ``encode_images_to_clip`` semantics, ``cli/encode_images.py:30-55``)."""

    def __init__(
        self,
        weights_path: Optional[str] = None,
        cfg: CLIPConfig = VIT_B_32,
        bpe_path: Optional[str] = None,
        dtype=jnp.bfloat16,
        mesh=None,
    ) -> None:
        from ..weights.convert_clip import load_clip_params

        wpath = _require(weights_path, "CLIP_CODEC_CLIP_WEIGHTS", "CLIP")
        self.cfg = cfg
        self.model = CLIPModel(cfg, dtype=dtype)
        self.params = {"params": load_clip_params(str(wpath), cfg.vision_depth, cfg.text_depth)}
        self._bpe_path = bpe_path
        self._tokenizer: Optional[CLIPTokenizer] = None
        # Optional data parallelism: params replicated over `mesh`, the pixel
        # batch row-sharded over its `data` axis — GSPMD partitions the ViT
        # forward with zero model-code changes (encoding is embarrassingly
        # batch-parallel; the reference is single-device, cli/encode_images.py:46).
        self.mesh = mesh
        self._data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
            self._data_sharding = NamedSharding(mesh, P("data"))

        # Params are ARGUMENTS to the jitted fns, not closure constants:
        # closed-over arrays get serialized into the program (600MB for
        # ViT-B/32), which breaks remote-compile setups and bloats caches.
        @jax.jit
        def _embed_images_p(params, pixels):
            z = self.model.apply(params, pixels, method=CLIPModel.encode_image)
            z = z.astype(jnp.float32)
            return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

        @jax.jit
        def _embed_tokens_p(params, tokens):
            z = self.model.apply(params, tokens, method=CLIPModel.encode_text)
            z = z.astype(jnp.float32)
            return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

        def _place(x):
            x = jnp.asarray(x)
            if self._data_sharding is not None:
                x = jax.device_put(x, self._data_sharding)
            return x

        # uint8 pixel batches (preprocess_pil_u8) normalize ON DEVICE via a
        # host-built LUT — bit-identical to host normalize by construction
        # (clip_normalize_table docstring), 4x less transfer. Its own jit so
        # the ViT program is byte-identical either way (same pattern and
        # rationale as train.data.scale_m11_u8).
        from .clip import clip_normalize_table

        table = clip_normalize_table()  # (256, 3) fp32, 3 KB

        @jax.jit
        def _normalize_u8(x):
            idx = x.astype(jnp.int32) * 3 + jnp.arange(3, dtype=jnp.int32)
            return jnp.take(jnp.asarray(table).reshape(-1), idx)

        def _norm(x):
            return _normalize_u8(x) if x.dtype == jnp.uint8 else x

        self._embed_images = lambda pixels: _embed_images_p(self.params, _norm(_place(pixels)))
        # text queries are tiny (often a single row) — keep them unsharded
        self._embed_tokens = lambda tokens: _embed_tokens_p(self.params, jnp.asarray(tokens))

    @property
    def tokenizer(self) -> CLIPTokenizer:
        if self._tokenizer is None:
            self._tokenizer = CLIPTokenizer(self._bpe_path, self.cfg.context_length)
        return self._tokenizer

    def encode_images(
        self, paths: Sequence[str], batch_size: int = 64, verbose: bool = True
    ) -> Tuple[np.ndarray, List[str]]:
        """Encode image files; corrupt files are silently skipped
        (reference ``cli/encode_images.py:42-43``). Returns (Z, kept_paths)."""
        return _batched_encode(
            paths,
            # uint8 over the link; _embed_images LUT-normalizes on device
            # (bit-identical to host preprocess_pil, 4x less transfer)
            lambda p: preprocess_pil_u8(Image.open(p), self.cfg.image_size),
            self._embed_images, batch_size, self.mesh, self.cfg.embed_dim,
        )

    def encode_image_array(self, images_hwc: np.ndarray) -> np.ndarray:
        """Encode already-loaded HWC images. Float inputs must be fully
        CLIP-preprocessed (resize/crop/normalize) by the caller; **uint8**
        inputs (``preprocess_pil_u8`` output) are mean/std-normalized on
        device via the bit-exact LUT."""
        return np.asarray(self._embed_images(jnp.asarray(images_hwc)))

    def encode_text(self, texts) -> np.ndarray:
        tokens = self.tokenizer(texts)
        return np.asarray(self._embed_tokens(jnp.asarray(tokens)))


class DinoEncoder:
    """DINOv2 encode path (reference ``cli/encode_images_dino.py:20-42``),
    batched instead of the reference's per-image loop."""

    def __init__(self, weights_path: Optional[str] = None, cfg: DinoConfig = DINOV2_BASE, dtype=jnp.bfloat16,
                 mesh=None):
        wpath = _require(weights_path, "CLIP_CODEC_DINO_WEIGHTS", "DINOv2")
        self.cfg = cfg
        self.model = DinoV2(cfg, dtype=dtype)
        if str(wpath).endswith(".safetensors"):
            from safetensors.numpy import load_file

            sd = load_file(str(wpath))
        else:
            import torch

            sd = torch.load(wpath, map_location="cpu", weights_only=True)
        self.params = {"params": convert_dino_hf(sd, cfg.depth)}
        self.mesh = mesh
        self._data_sharding = None
        if mesh is not None:  # same DP layout as ClipEncoder
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
            self._data_sharding = NamedSharding(mesh, P("data"))

        @jax.jit
        def _embed_p(params, pixels):
            z = self.model.apply(params, pixels).astype(jnp.float32)
            return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-9)

        def _place(x):
            x = jnp.asarray(x)
            if self._data_sharding is not None:
                x = jax.device_put(x, self._data_sharding)
            return x

        self._embed = lambda pixels: _embed_p(self.params, _place(pixels))

    def encode_images(self, paths: Sequence[str], batch_size: int = 16) -> Tuple[np.ndarray, List[str]]:
        def preprocess(p):
            arr = np.asarray(Image.open(p).convert("RGB"), dtype=np.float32) / 255.0
            return preprocess_dino(arr, self.cfg.image_size)

        return _batched_encode(
            paths, preprocess, self._embed, batch_size, self.mesh, self.cfg.dim,
        )
