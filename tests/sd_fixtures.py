"""Shared tiny-SD-store builder for tests and cluster workers — ONE place
the store format (PNG images, affine-quantized embeddings, fp16 CHW latent
.npz, manifest_latents.json) is constructed, so format changes cannot drift
between the fixture and the 2-process workers."""

import json
from pathlib import Path

import jax
import numpy as np
from PIL import Image


def build_tiny_sd_store(root: Path, dec, n: int = 4, d: int = 32, size: int = 16) -> Path:
    """Deterministic store with images, bitstreams AND latents (encoded with
    ``dec``'s VAE). Same content for the same inputs on every call."""
    import jax.numpy as jnp

    from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
    from clip_codec_tpu.io.store import write_store
    from clip_codec_tpu.train.data import load_image_m11

    rng = np.random.default_rng(0)
    img_dir = Path(root) / "imgs"
    img_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        p = img_dir / f"im{i}.png"
        Image.fromarray(rng.integers(0, 256, (size, size, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = Path(root) / "store"
    manifest = write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)
    lat_dir = store / "latents"
    lat_dir.mkdir(exist_ok=True)
    key = jax.random.PRNGKey(5)
    for rec in manifest:
        x = load_image_m11(rec["image"], size)[None]
        key, k2 = jax.random.split(key)
        lat = np.asarray(dec.encode(jnp.asarray(x), k2))[0]
        lat_path = lat_dir / (Path(rec["image"]).stem + ".npz")
        # fp16 CHW, key 'lat' — reference format parity
        np.savez_compressed(lat_path, lat=lat.transpose(2, 0, 1).astype(np.float16))
        rec["latent"] = str(lat_path)
    (store / "manifest_latents.json").write_text(json.dumps(manifest, indent=2))
    return store
